"""M6 multi-chip tests on the virtual 8-device CPU mesh: distributed
invert/predict/solve must match the single-device results exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ska_sdp_func_python_tpu.models import (
    SkyComponents,
    create_gaintable_from_visibility,
)
from ska_sdp_func_python_tpu.ops import (
    apply_gaintable,
    create_image_from_visibility,
    dft_skycomponent_visibility,
    invert_visibility,
    predict_visibility,
    solve_gaintable,
)
from ska_sdp_func_python_tpu.parallel import (
    distributed_invert,
    distributed_predict,
    distributed_solve_gaintable,
    make_mesh,
)

from simul import make_visibility
from test_solvers import _simulate_gaintable


PC = (0.0, np.deg2rad(-35.0))


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, jax.devices()
    return make_mesh(axis_names=("data",))


def _obs(rng, npixel=128):
    vis = make_visibility(
        nants=10, ntimes=4, nchan=1, rmax=300.0, phasecentre=PC
    )
    model = create_image_from_visibility(
        vis, npixel=npixel, oversampling=4.0, nchan=1
    )
    ra, dec = model.pixel_to_radec(npixel // 2 + 9, npixel // 2 - 6)
    comps = SkyComponents.from_lists(
        [[float(ra), float(dec)]], [[[1.3]]], vis.frequency
    )
    vis = dft_skycomponent_visibility(vis, comps)
    return vis, model


class TestDistributed:
    def test_invert_matches_single_device(self, rng, mesh):
        vis, model = _obs(rng)
        ref, swt_ref = invert_visibility(
            vis, model, context="2d", support=8
        )
        dist, swt = distributed_invert(
            vis, model, mesh, support=8, do_wstacking=False
        )
        np.testing.assert_allclose(np.asarray(swt), np.asarray(swt_ref))
        np.testing.assert_allclose(
            np.asarray(dist.pixels), np.asarray(ref.pixels), atol=1e-10
        )

    def test_predict_matches_single_device(self, rng, mesh):
        vis, model = _obs(rng)
        pixels = jnp.zeros_like(model.pixels).at[0, 0, 70, 40].set(1.0)
        model_img = model.with_pixels(pixels)
        # single-device predict shifts to the image centre; distributed
        # kernel operates on the already-shifted vis, so compare cores
        ref = predict_visibility(vis, model_img, context="2d")
        dist = distributed_predict(vis, model_img, mesh)
        # distributed_predict omits the shift (phase centres coincide here)
        np.testing.assert_allclose(
            np.asarray(dist.vis), np.asarray(ref.vis), atol=1e-10
        )

    def test_solve_matches_single_device(self, rng, mesh):
        vis, model = _obs(rng)
        gt_true = create_gaintable_from_visibility(vis, jones_type="T")
        gt_true = _simulate_gaintable(gt_true, rng, phase_error=0.2)
        corrupted = apply_gaintable(vis, gt_true)
        ref = solve_gaintable(
            corrupted, vis, phase_only=True, jones_type="T"
        )
        dist = distributed_solve_gaintable(
            corrupted, vis, mesh, phase_only=True, jones_type="T"
        )
        np.testing.assert_allclose(
            np.asarray(dist.gain), np.asarray(ref.gain), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(dist.residual), np.asarray(ref.residual), atol=1e-10
        )


class TestDistributedSelfcal:
    def test_distributed_ical_recovers(self, rng, mesh):
        from ska_sdp_func_python_tpu.models import (
            create_gaintable_from_visibility,
        )
        from ska_sdp_func_python_tpu.parallel import distributed_ical

        vis, model = _obs(rng)
        flux_truth = 1.3
        gt_true = create_gaintable_from_visibility(vis, jones_type="T")
        gt_true = _simulate_gaintable(gt_true, rng, phase_error=0.3)
        corrupted = apply_gaintable(vis, gt_true)
        current, residual, restored, gt = distributed_ical(
            corrupted,
            model,
            mesh,
            nmajor=3,
            algorithm="hogbom",
            niter=200,
            gain=0.2,
            fractional_threshold=0.01,
        )
        assert float(jnp.max(jnp.abs(residual.pixels))) < 0.2
        peak = float(jnp.max(restored.pixels))
        assert abs(peak - flux_truth) < 0.15, peak

    def test_sharded_fused_ical_matches_single_device(self, rng, mesh):
        """Baseline-sharded fused cycle (psum normal equations + psum uv
        grids, per-shard plans) vs the single-device fused ical."""
        from ska_sdp_func_python_tpu.parallel import sharded_ical
        from ska_sdp_func_python_tpu.pipeline import ical

        vis, model = _obs(rng)
        gt_true = create_gaintable_from_visibility(vis, jones_type="T")
        gt_true = _simulate_gaintable(gt_true, rng, phase_error=0.3)
        corrupted = apply_gaintable(vis, gt_true)
        kw = dict(
            nmajor=3,
            calibration_context="T",
            algorithm="hogbom",
            niter=200,
            gain=0.2,
            fractional_threshold=0.01,
        )
        c1, r1, s1, g1 = sharded_ical(
            corrupted, model, mesh, context="ng", **kw
        )
        c0, r0, s0, g0 = ical(
            corrupted, model, context="ng", use_plan=True, fused=True,
            **kw,
        )
        # same sky, same gains: sharding changes only summation order
        ga = np.asarray(g0["T"].gain)[..., 0, 0]
        gb = np.asarray(g1["T"].gain)[..., 0, 0]
        pa = ga * np.exp(-1j * np.angle(ga[:, :1]))
        pb = gb * np.exp(-1j * np.angle(gb[:, :1]))
        assert np.max(np.abs(pa - pb)) < 1e-4
        r0p = float(jnp.max(jnp.abs(r0.pixels)))
        r1p = float(jnp.max(jnp.abs(r1.pixels)))
        assert r1p < 0.2, r1p
        assert abs(r0p - r1p) < 1e-2
        assert abs(
            float(jnp.max(s0.pixels)) - float(jnp.max(s1.pixels))
        ) < 0.05

    def _cube_obs(self, rng, nchan=8, npixel=64):
        vis = make_visibility(
            nants=8, ntimes=3, nchan=nchan, rmax=300.0, phasecentre=PC
        )
        model = create_image_from_visibility(
            vis, npixel=npixel, oversampling=4.0, nchan=nchan
        )
        ra, dec = model.pixel_to_radec(npixel // 2 + 7, npixel // 2 - 5)
        # mild spectral slope so MSMFS moments are non-trivial
        flux = 2.0 * (np.asarray(vis.frequency) / 1.0e8) ** -0.7
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]], flux[None, :, None], vis.frequency
        )
        vis = dft_skycomponent_visibility(vis, comps)
        gt_true = create_gaintable_from_visibility(vis, jones_type="T")
        gt_true = _simulate_gaintable(gt_true, rng, phase_error=0.3)
        return apply_gaintable(vis, gt_true), model

    def test_channel_sharded_fused_ical_cube(self, rng, mesh):
        """Channel-sharded fused cube cycle (local gridding/FFT/CLEAN per
        channel shard, psum only for the gain normal equations) vs the
        single-device fused cube ical."""
        from ska_sdp_func_python_tpu.parallel import sharded_ical
        from ska_sdp_func_python_tpu.pipeline import ical

        corrupted, model = self._cube_obs(rng)
        kw = dict(
            nmajor=3,
            calibration_context="T",
            algorithm="hogbom",
            niter=150,
            gain=0.2,
            fractional_threshold=0.01,
        )
        c1, r1, s1, g1 = sharded_ical(
            corrupted, model, mesh, context="ng", shard="channel", **kw
        )
        c0, r0, s0, g0 = ical(
            corrupted, model, context="ng", use_plan=True, fused=True,
            **kw,
        )
        ga = np.asarray(g0["T"].gain)[..., 0, 0]
        gb = np.asarray(g1["T"].gain)[..., 0, 0]
        pa = ga * np.exp(-1j * np.angle(ga[:, :1]))
        pb = gb * np.exp(-1j * np.angle(gb[:, :1]))
        assert np.max(np.abs(pa - pb)) < 1e-4
        r1p = float(jnp.max(jnp.abs(r1.pixels)))
        assert r1p < 0.25, r1p
        np.testing.assert_allclose(
            np.asarray(r1.pixels), np.asarray(r0.pixels), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(c1.pixels), np.asarray(c0.pixels), atol=2e-3
        )

    def test_channel_sharded_fused_ical_msmfs(self, rng, mesh):
        """MSMFS over channel shards: the channel->moment transforms psum
        partial moment cubes across the mesh about the global reference
        frequency; must match the single-device fused MSMFS cycle."""
        from ska_sdp_func_python_tpu.parallel import sharded_ical
        from ska_sdp_func_python_tpu.pipeline import ical

        corrupted, model = self._cube_obs(rng)
        kw = dict(
            nmajor=2,
            calibration_context="T",
            algorithm="mmclean",
            nmoment=2,
            niter=100,
            gain=0.2,
            scales=[0, 3],
            fractional_threshold=0.01,
        )
        c1, r1, s1, g1 = sharded_ical(
            corrupted, model, mesh, context="ng", shard="channel", **kw
        )
        c0, r0, s0, g0 = ical(
            corrupted, model, context="ng", use_plan=True, fused=True,
            **kw,
        )
        np.testing.assert_allclose(
            np.asarray(r1.pixels), np.asarray(r0.pixels), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(c1.pixels), np.asarray(c0.pixels), atol=2e-3
        )


class TestRedistribute:
    def test_visibility_all_to_all_roundtrip(self, rng, mesh):
        """baseline-sharded -> time-sharded -> back: values unchanged,
        shardings as requested (the M6 all-to-all re-chunking between
        solve/image stages)."""
        from ska_sdp_func_python_tpu.parallel import (
            redistribute_visibility,
        )

        vis, _ = _obs(rng)
        # pad axes to the device count for even shards
        nt, nbl = vis.ntimes, vis.nbaselines
        ndev = 8
        padt, padb = (-nt) % ndev, (-nbl) % ndev

        def pad2(x):
            w = [(0, 0)] * x.ndim
            if x.ndim >= 2:
                w[0], w[1] = (0, padt), (0, padb)
            return jnp.pad(x, w)

        vis = vis.replace(
            vis=pad2(vis.vis),
            weight=pad2(vis.weight),
            imaging_weight=pad2(vis.imaging_weight),
            flags=pad2(vis.flags),
            uvw=pad2(vis.uvw),
            time=jnp.pad(vis.time, (0, padt)),
            integration_time=jnp.pad(vis.integration_time, (0, padt)),
            antenna1=jnp.pad(jnp.asarray(vis.antenna1), (0, padb)),
            antenna2=jnp.pad(jnp.asarray(vis.antenna2), (0, padb)),
        )
        bl_sharded = redistribute_visibility(vis, mesh, to="baseline")
        spec = bl_sharded.vis.sharding.spec
        assert spec[1] == "data", spec
        t_sharded = redistribute_visibility(
            bl_sharded, mesh, to="time"
        )
        spec = t_sharded.vis.sharding.spec
        assert spec[0] == "data", spec
        np.testing.assert_array_equal(
            np.asarray(t_sharded.vis), np.asarray(vis.vis)
        )
        np.testing.assert_array_equal(
            np.asarray(t_sharded.uvw), np.asarray(vis.uvw)
        )


class TestShardedFullJones:
    def test_baseline_sharded_matrix_matches_single_device(self, rng, mesh):
        """Full-Jones (matrix) term on the baseline-sharded mesh: the
        psum'd normal equations feed the matrix StefCal and the Mueller
        residual leg runs per shard — must match the single-device fused
        cycle (round 3; crosspol was composed-only in round 2)."""
        from ska_sdp_func_python_tpu.ops import (
            create_calibration_controls,
        )
        from ska_sdp_func_python_tpu.parallel import sharded_ical
        from ska_sdp_func_python_tpu.pipeline import ical

        vis = make_visibility(
            nants=10, ntimes=3, nchan=1, rmax=300.0, phasecentre=PC,
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
        gt_true = create_gaintable_from_visibility(vis, jones_type="T")
        gt_true = _simulate_gaintable(
            gt_true, rng, phase_error=0.2, amplitude_error=0.05
        )
        g = np.array(gt_true.gain)
        leak = 0.06 * (
            rng.normal(size=g[..., 0, 1].shape)
            + 1j * rng.normal(size=g[..., 0, 1].shape)
        )
        g[..., 0, 1] = leak
        g[..., 1, 0] = np.conj(leak) * 0.5
        gt_true = gt_true.replace(gain=jnp.asarray(g))
        corrupted = apply_gaintable(vis, gt_true)
        controls = create_calibration_controls()
        controls["T"] = dict(controls["T"])
        controls["T"]["shape"] = "matrix"
        controls["T"]["phase_only"] = False
        kw = dict(
            nmajor=2, calibration_context="T", controls=controls,
            components=comps, algorithm="hogbom", niter=100, gain=0.2,
            fractional_threshold=0.01,
        )
        c1, r1, s1, g1 = sharded_ical(
            corrupted, model, mesh, context="ng", **kw
        )
        c0, r0, s0, g0 = ical(
            corrupted, model, context="ng", use_plan=True, fused=True,
            **kw,
        )
        ga = np.asarray(g0["T"].gain)
        gb = np.asarray(g1["T"].gain)
        assert np.max(np.abs(ga - gb)) < 1e-5, np.max(np.abs(ga - gb))
        r0p = float(jnp.max(jnp.abs(r0.pixels)))
        r1p = float(jnp.max(jnp.abs(r1.pixels)))
        assert abs(r0p - r1p) < 1e-3, (r0p, r1p)


class TestCollectiveAudit:
    """The sharded cycle's per-cycle communication contract (README
    scaling model): exactly one NE psum, one weight psum, one uv-grid
    psum — O(nants^2 + nw*npad^2), independent of visibility count."""

    def test_hlo_collectives(self, rng, mesh):
        import sys

        sys.path.insert(0, ".")
        from bench_scaling_model import parse_collectives
        from ska_sdp_func_python_tpu.parallel import sharded_ical

        vis, model = _obs(rng)
        hlo = []
        sharded_ical(
            vis, model, mesh, nmajor=1, calibration_context="T",
            context="ng", algorithm="hogbom", niter=20, gain=0.2,
            fractional_threshold=0.01, hlo_out=hlo,
        )
        colls = parse_collectives(hlo[0])
        ops = [c[0] for c in colls]
        # round 5 (VERDICT r4 item 6): the uv grids ride ONE
        # reduce-scatter (1x data of ring traffic instead of the psum's
        # 2x) feeding an n-way-parallel sharded tail whose summed
        # npixel^2 partial image is psum'd (small). Expected per cycle:
        # NE psum + weight psum + grid reduce-scatter + image psum
        # (possibly fused with the sumwt scalar); nothing else.
        assert ops.count("reduce-scatter") == 1, colls
        assert ops.count("all-reduce") == len(ops) - 1 <= 4, colls
        from ska_sdp_func_python_tpu.ops.imaging import _npad_for, _nw_for

        npad = _npad_for(model.npixel, 1.25)
        nwp = _nw_for(vis, model, True, None)
        ndev = 8
        nw_pad = -(-nwp // ndev) * ndev
        # the reduce-scatter moves the full grid volume once; its HLO
        # OUTPUT shape is the per-device plane block
        rs_bytes = (nw_pad // ndev) * npad * npad * 8
        rs = [c for c in colls if c[0] == "reduce-scatter"][0]
        assert rs[2] == rs_bytes, (rs, rs_bytes)
        # the image psum is npixel^2 f32 — 2*nw*ndev/npixel-fold less
        # ring traffic than the old grid psum
        img_bytes = model.npixel * model.npixel * 4
        assert any(
            b in (img_bytes, img_bytes + 4) and op == "all-reduce"
            for op, _, b in colls
        ), colls
