"""Widened streamed_ical scope (VERDICT round-2 item 4): multi-term
chains, npol 2/4 diagonal, multi-channel MFS/cube, bandpass, in-stream
components — each gate verified corrupt -> stream -> recover against the
in-memory ``pipeline.ical`` on the same data (test_bandpass.py style)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ska_sdp_func_python_tpu.io import write_visibility
from ska_sdp_func_python_tpu.models import (
    SkyComponents,
    create_gaintable_from_visibility,
)
from ska_sdp_func_python_tpu.ops import (
    apply_gaintable,
    create_image_from_visibility,
    dft_skycomponent_visibility,
)
from ska_sdp_func_python_tpu.pipeline import ical
from ska_sdp_func_python_tpu.streaming import streamed_ical

from simul import make_visibility
from test_solvers import _simulate_gaintable

PC = (0.0, np.deg2rad(-35.0))


def _source_vis(rng, nchan=1, polarisation_frame="stokesI", nants=8,
                ntimes=6, npixel=64, flux=1.5, off=(5, -4)):
    vis = make_visibility(
        nants=nants, ntimes=ntimes, nchan=nchan, rmax=300.0,
        phasecentre=PC, polarisation_frame=polarisation_frame,
    )
    model = create_image_from_visibility(
        vis, npixel=npixel, oversampling=4.0, nchan=nchan,
        polarisation_frame=polarisation_frame,
    )
    ra, dec = model.pixel_to_radec(npixel // 2 + off[0], npixel // 2 + off[1])
    comps = SkyComponents.from_lists(
        [[float(ra), float(dec)]],
        [[[flux]] * nchan],
        vis.frequency,
    )
    vis = dft_skycomponent_visibility(vis, comps)
    return vis, model, comps


def _stream_and_memory(tmp_path, corrupted, model, *, context="T",
                       controls=None, components=None, **kw):
    path = str(tmp_path / "wide.svis")
    write_visibility(corrupted, path, chunk_times=2)
    skw = dict(kw)
    res = streamed_ical(
        path, model, PC, chunk_times=2, calibration_context=context,
        controls=controls, components=components, **skw,
    )
    mem = ical(
        corrupted, model, components=components,
        calibration_context=context, controls=controls, context="ng",
        use_plan=True, **kw,
    )
    return res, mem


def _assert_match(res, mem, resid_tol=0.03, peak_tol=0.06):
    r_stream = float(jnp.max(jnp.abs(res.residual.pixels)))
    r_mem = float(jnp.max(jnp.abs(mem[1].pixels)))
    assert abs(r_stream - r_mem) < resid_tol, (r_stream, r_mem)
    p_stream = float(jnp.max(res.restored.pixels))
    p_mem = float(jnp.max(mem[2].pixels))
    assert abs(p_stream - p_mem) < peak_tol, (p_stream, p_mem)
    return r_stream, p_stream


CLEAN_KW = dict(
    nmajor=3, algorithm="hogbom", niter=150, gain=0.2,
    fractional_threshold=0.01,
)


class TestStreamedWideScope:
    def test_npol2_diagonal(self, tmp_path, rng):
        """linearnp (XX, YY) data with a diagonal T corruption streams
        and recovers FROM SCRATCH: the streamed PSF pass grids every
        polarisation (not the reference's pol-0-only ng.py:230-238
        convention), so both receptors' model planes populate and the
        diagonal solve stays full-rank — the in-memory loop needs a
        component-seeded model for this configuration (see
        test_composite.test_ical_fused_npol4_diagonal)."""
        vis, model, _ = _source_vis(
            rng, polarisation_frame="linearnp", flux=1.2
        )
        gt = create_gaintable_from_visibility(vis, jones_type="T")
        gt = _simulate_gaintable(gt, rng, phase_error=0.3)
        corrupted = apply_gaintable(vis, gt)
        path = str(tmp_path / "np2.svis")
        write_visibility(corrupted, path, chunk_times=2)
        res = streamed_ical(
            path, model, PC, chunk_times=2, calibration_context="T",
            **CLEAN_KW,
        )
        r = float(jnp.max(jnp.abs(res.residual.pixels)))
        assert r < 0.1, r
        for p in range(2):
            pk = float(jnp.max(res.restored.pixels[0, p]))
            assert abs(pk - 1.2) < 0.15, (p, pk)
        assert res.model.pixels.shape == (1, 2, 64, 64)

    def test_npol4_diagonal_with_components(self, tmp_path, rng):
        """Full linear (XX, XY, YX, YY) data, diagonal Jones, model
        seeded by in-stream components (the valid npol-4 self-cal
        configuration — both receptors carry model flux); matches the
        in-memory fused cycle."""
        vis = make_visibility(
            nants=8, ntimes=4, nchan=1, rmax=300.0, phasecentre=PC,
            polarisation_frame="linear",
        )
        model = create_image_from_visibility(
            vis, npixel=64, oversampling=4.0, nchan=1,
            polarisation_frame="linear",
        )
        ra, dec = model.pixel_to_radec(37, 28)
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]],
            np.asarray([[[2.0, 0.0, 0.0, 0.0]]]),
            vis.frequency,
            polarisation_frame="stokesIQUV",
        )
        vis = dft_skycomponent_visibility(vis, comps)
        gt = create_gaintable_from_visibility(vis, jones_type="T")
        gt = _simulate_gaintable(gt, rng, phase_error=0.25)
        corrupted = apply_gaintable(vis, gt)
        res, mem = _stream_and_memory(
            tmp_path, corrupted, model, context="T",
            components=comps, nmajor=2, algorithm="hogbom", niter=100,
            gain=0.2, fractional_threshold=0.01,
        )
        r_stream = float(jnp.max(jnp.abs(res.residual.pixels)))
        r_mem = float(jnp.max(jnp.abs(mem[1].pixels)))
        assert abs(r_stream - r_mem) < 0.03, (r_stream, r_mem)
        assert r_stream < 0.15, r_stream
        assert res.model.pixels.shape[1] == 4

    def test_mfs_multichannel(self, tmp_path, rng):
        """3-channel store imaged MFS (model nchan=1): every channel's
        visibilities grid onto the single image plane."""
        vis, model, _ = _source_vis(rng, nchan=3, flux=1.5)
        model1 = create_image_from_visibility(
            vis, npixel=64, oversampling=4.0, nchan=1
        )
        gt = create_gaintable_from_visibility(vis, jones_type="T")
        gt = _simulate_gaintable(gt, rng, phase_error=0.3)
        corrupted = apply_gaintable(vis, gt)
        res, mem = _stream_and_memory(
            tmp_path, corrupted, model1, context="T", **CLEAN_KW
        )
        r, p = _assert_match(res, mem)
        assert abs(p - 1.5) < 0.2, p
        assert res.model.pixels.shape == (1, 1, 64, 64)

    def test_cube_multichannel(self, tmp_path, rng):
        """3-channel store imaged as a spectral cube (model nchan=3),
        per-channel plans and per-channel CLEAN."""
        vis, model, comps = _source_vis(rng, nchan=3, flux=1.5)
        gt = create_gaintable_from_visibility(vis, jones_type="T")
        gt = _simulate_gaintable(gt, rng, phase_error=0.3)
        corrupted = apply_gaintable(vis, gt)
        res, mem = _stream_and_memory(
            tmp_path, corrupted, model, context="T", **CLEAN_KW
        )
        _assert_match(res, mem)
        assert res.model.pixels.shape == (3, 1, 64, 64)
        # every channel recovers the source
        for c in range(3):
            assert float(jnp.max(res.restored.pixels[c, 0])) > 1.0

    def test_chain_tg(self, tmp_path, rng):
        """Two-term chain "TG": T phase corruption + G amplitude
        corruption, both solved per slab; gaintable is a dict."""
        vis, model, _ = _source_vis(rng, flux=2.0)
        gt_t = create_gaintable_from_visibility(vis, jones_type="T")
        gt_t = _simulate_gaintable(gt_t, rng, phase_error=0.2)
        gt_g = create_gaintable_from_visibility(
            vis, jones_type="G", timeslice=60.0
        )
        gt_g = _simulate_gaintable(
            gt_g, rng, phase_error=0.0, amplitude_error=0.1
        )
        corrupted = apply_gaintable(apply_gaintable(vis, gt_g), gt_t)
        res, mem = _stream_and_memory(
            tmp_path, corrupted, model, context="TG", **CLEAN_KW
        )
        _assert_match(res, mem, resid_tol=0.05, peak_tol=0.1)
        assert sorted(res.gaintable) == ["G", "T"]
        assert res.gaintable["T"].jones_type == "T"

    def test_bandpass_stream(self, tmp_path, rng):
        """Bandpass "B" term on a 3-channel store: per-channel normal
        equations; time-constant corruption so the per-slab B solutions
        equal the monolithic one."""
        vis, model, _ = _source_vis(rng, nchan=3, flux=1.5, ntimes=4)
        gt_b = create_gaintable_from_visibility(vis, jones_type="B")
        # constant in time by construction (B has one interval)
        gt_b = _simulate_gaintable(gt_b, rng, phase_error=0.4)
        corrupted = apply_gaintable(vis, gt_b)
        res, mem = _stream_and_memory(
            tmp_path, corrupted, model, context="B",
            nmajor=3, algorithm="hogbom", niter=150, gain=0.2,
            fractional_threshold=0.01,
        )
        r, _ = _assert_match(res, mem, resid_tol=0.05)
        assert r < 0.25, r
        # streamed B gains carry the channel axis
        assert res.gaintable.gain.shape[2] == 3

    def test_in_stream_components(self, tmp_path, rng):
        """Sky components predicted in-stream via the DFT: the
        component is calibrated against but NOT cleaned into the image
        model."""
        vis, model, comps = _source_vis(rng, flux=2.0)
        gt = create_gaintable_from_visibility(vis, jones_type="T")
        gt = _simulate_gaintable(gt, rng, phase_error=0.3)
        corrupted = apply_gaintable(vis, gt)
        res, mem = _stream_and_memory(
            tmp_path, corrupted, model, context="T",
            components=comps, **CLEAN_KW,
        )
        r_stream = float(jnp.max(jnp.abs(res.residual.pixels)))
        r_mem = float(jnp.max(jnp.abs(mem[1].pixels)))
        assert abs(r_stream - r_mem) < 0.03, (r_stream, r_mem)
        # the component explains the source: the CLEANed image model
        # holds (almost) no flux
        assert float(jnp.sum(jnp.abs(res.model.pixels))) < 0.2
        assert r_stream < 0.1, r_stream

    def test_rejects_mismatched_model(self, tmp_path, rng):
        vis, model, _ = _source_vis(rng, nchan=3)
        path = str(tmp_path / "rej.svis")
        write_visibility(vis, path, chunk_times=2)
        bad = create_image_from_visibility(
            vis, npixel=64, oversampling=4.0, nchan=2
        )
        with pytest.raises(ValueError, match="nchan"):
            streamed_ical(path, bad, PC, chunk_times=2, nmajor=1)


class TestStreamedFullJones:
    def test_streamed_matrix_matches_memory(self, tmp_path, rng):
        """Full-Jones (matrix) term streams: _slab_step's Mueller
        corrected-visibility branch vs the in-memory fused cycle."""
        from ska_sdp_func_python_tpu.ops import (
            create_calibration_controls,
        )

        vis = make_visibility(
            nants=8, ntimes=4, nchan=1, rmax=300.0, phasecentre=PC,
            polarisation_frame="linear",
        )
        model = create_image_from_visibility(
            vis, npixel=64, oversampling=4.0, nchan=1,
            polarisation_frame="linear",
        )
        ra, dec = model.pixel_to_radec(37, 28)
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]],
            np.asarray([[[2.0, 0.3, 0.15, 0.0]]]),
            vis.frequency,
            polarisation_frame="stokesIQUV",
        )
        vis = dft_skycomponent_visibility(vis, comps)
        gt = create_gaintable_from_visibility(vis, jones_type="T")
        gt = _simulate_gaintable(
            gt, rng, phase_error=0.2, amplitude_error=0.05
        )
        g = np.array(gt.gain)
        leak = 0.06 * (
            rng.normal(size=g[..., 0, 1].shape)
            + 1j * rng.normal(size=g[..., 0, 1].shape)
        )
        g[..., 0, 1] = leak
        g[..., 1, 0] = np.conj(leak) * 0.5
        gt = gt.replace(gain=jnp.asarray(g))
        corrupted = apply_gaintable(vis, gt)
        controls = create_calibration_controls()
        controls["T"] = dict(controls["T"])
        controls["T"]["shape"] = "matrix"
        controls["T"]["phase_only"] = False
        path = str(tmp_path / "fj.svis")
        write_visibility(corrupted, path, chunk_times=2)
        # niter=0: no CLEAN, so both loops solve against the SAME
        # (components-only) model — the streamed PSF pass grids every
        # pol while the in-memory one keeps the reference's pol-0-only
        # convention, which would otherwise diverge the clean legs.
        # "mean" matches the in-memory cycle's reference amplitude
        # normalisation.
        kw = dict(nmajor=2, algorithm="hogbom", niter=0, gain=0.2,
                  fractional_threshold=0.01)
        res = streamed_ical(
            path, model, PC, chunk_times=2, calibration_context="T",
            controls=controls, components=comps,
            normalise_gains="mean", **kw,
        )
        mem = ical(
            corrupted, model, components=comps, calibration_context="T",
            controls=controls, context="ng", use_plan=True, fused=True,
            **kw,
        )
        r_stream = float(jnp.max(jnp.abs(res.residual.pixels)))
        r_mem = float(jnp.max(jnp.abs(mem[1].pixels)))
        assert abs(r_stream - r_mem) < 1e-3, (r_stream, r_mem)
        assert res.gaintable.gain.shape[-2:] == (2, 2)


def test_streamed_warm_start_continues(tmp_path, rng):
    """model_init warm start (checkpoint/resume): 2+2 warm-started
    cycles converge at least as well as 2 cold cycles and close to a
    monolithic 4-cycle run."""
    vis, model, _ = _source_vis(rng)
    gt_true = create_gaintable_from_visibility(vis, jones_type="T")
    gt_true = _simulate_gaintable(gt_true, rng, phase_error=0.3)
    corrupted = apply_gaintable(vis, gt_true)
    path = str(tmp_path / "warm.svis")
    write_visibility(corrupted, path, chunk_times=2)
    kw = dict(
        chunk_times=2, calibration_context="T", context="ng",
        algorithm="hogbom", niter=150, gain=0.2,
        fractional_threshold=0.01,
    )
    c2, r2, _, _ = streamed_ical(path, model, PC, nmajor=2, **kw)
    c4, r4, _, _ = streamed_ical(path, model, PC, nmajor=4, **kw)
    cw, rw, _, _ = streamed_ical(
        path, model, PC, nmajor=2, model_init=c2, **kw
    )
    p2 = float(jnp.max(jnp.abs(r2.pixels)))
    p4 = float(jnp.max(jnp.abs(r4.pixels)))
    pw = float(jnp.max(jnp.abs(rw.pixels)))
    assert pw <= p2 * 1.01, (pw, p2)
    # warm-started 2+2 lands in the monolithic 4-cycle ballpark
    assert pw <= max(2.0 * p4, 0.05), (pw, p4)


def test_streamed_f16_wire_matches_f32(tmp_path, rng):
    """wire_dtype="f16" (per-slab-scaled observed streams, dequantised
    on device) reproduces the f32-wire run within the quantisation
    budget (round 5: the 1B out-of-core wire-compression mode)."""
    vis, model, _ = _source_vis(rng, flux=2.0)
    gt = create_gaintable_from_visibility(vis, jones_type="T")
    gt = _simulate_gaintable(gt, rng, phase_error=0.3)
    corrupted = apply_gaintable(vis, gt)
    path = str(tmp_path / "wire.svis")
    write_visibility(corrupted, path, chunk_times=2)
    r32 = streamed_ical(
        path, model, PC, chunk_times=2, calibration_context="T",
        **CLEAN_KW,
    )
    r16 = streamed_ical(
        path, model, PC, chunk_times=2, calibration_context="T",
        wire_dtype="f16", **CLEAN_KW,
    )
    p32 = float(jnp.max(r32.restored.pixels))
    p16 = float(jnp.max(r16.restored.pixels))
    assert abs(p32 - p16) < 5e-3 * max(abs(p32), 1.0), (p32, p16)


def test_streamed_uvw_compute_matches_store(tmp_path, rng):
    """uvw_compute= (device-side uvw from geometry) must reproduce the
    store-uvw run when the callable returns the same coordinates."""
    vis, model, _ = _source_vis(rng, flux=2.0)
    gt = create_gaintable_from_visibility(vis, jones_type="T")
    gt = _simulate_gaintable(gt, rng, phase_error=0.3)
    corrupted = apply_gaintable(vis, gt)
    path = str(tmp_path / "geom.svis")
    write_visibility(corrupted, path, chunk_times=2)
    times = np.asarray(corrupted.time)
    uvw_all = np.asarray(corrupted.uvw)  # [T, B, 3]

    def uvw_compute(tsec):
        # lookup-based stand-in for an analytic geometry closure: maps
        # each (possibly padded) time to its uvw rows
        idx = jnp.clip(
            jnp.searchsorted(jnp.asarray(times.astype(tsec.dtype)), tsec),
            0, len(times) - 1,
        )
        return jnp.asarray(uvw_all.astype(np.float64))[idx]

    r_store = streamed_ical(
        path, model, PC, chunk_times=2, calibration_context="T",
        **CLEAN_KW,
    )
    r_geom = streamed_ical(
        path, model, PC, chunk_times=2, calibration_context="T",
        uvw_compute=uvw_compute, **CLEAN_KW,
    )
    np.testing.assert_allclose(
        np.asarray(r_geom.restored.pixels),
        np.asarray(r_store.restored.pixels),
        atol=1e-6,
    )
