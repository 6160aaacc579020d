"""Native C++ visibility store tests: write/read round trip + prefetch
streaming."""

import numpy as np
import pytest

from ska_sdp_func_python_tpu.io import (
    VisStore,
    stream_visibility_chunks,
    write_visibility,
)

from simul import make_visibility


@pytest.fixture
def store_path(tmp_path, rng):
    vis = make_visibility(nants=6, ntimes=10, nchan=3)
    data = (
        rng.normal(size=vis.vis.shape) + 1j * rng.normal(size=vis.vis.shape)
    )
    vis = vis.replace(vis=vis.vis + data.astype(np.complex128))
    path = str(tmp_path / "test.svis")
    write_visibility(vis, path, chunk_times=4)
    return path, vis


class TestVisStore:
    def test_roundtrip_sync(self, store_path):
        path, vis = store_path
        with VisStore(path) as store:
            assert (store.ntime, store.nbl, store.nchan, store.npol) == (
                vis.ntimes,
                vis.nbaselines,
                vis.nchan,
                vis.npol,
            )
            np.testing.assert_allclose(
                store.frequency, np.asarray(vis.frequency)
            )
            np.testing.assert_allclose(
                store.uvw, np.asarray(vis.uvw), atol=1e-12
            )
            re, im, wt, fl = store.read_chunk(2, 3)
            np.testing.assert_allclose(
                re,
                np.real(np.asarray(vis.vis))[2:5].astype(np.float32),
            )
            np.testing.assert_allclose(
                im,
                np.imag(np.asarray(vis.vis))[2:5].astype(np.float32),
            )
            np.testing.assert_allclose(
                wt, np.asarray(vis.weight)[2:5].astype(np.float32)
            )

    def test_streaming_prefetch(self, store_path):
        path, vis = store_path
        chunks = list(stream_visibility_chunks(path, chunk_times=4))
        assert [c["t0"] for c in chunks] == [0, 4, 8]
        total = sum(c["vis_re"].shape[0] for c in chunks)
        assert total == vis.ntimes
        got = np.concatenate([c["vis_re"] for c in chunks])
        np.testing.assert_allclose(
            got, np.real(np.asarray(vis.vis)).astype(np.float32)
        )


class TestStreamedICAL:
    def test_streamed_matches_in_memory_ical(self, tmp_path, rng):
        """streamed_ical over the native store == in-memory ical on the
        same data (same algorithm, per-slab exact gain intervals)."""
        import jax.numpy as jnp

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
        from test_solvers import _simulate_gaintable

        pc = (0.0, np.deg2rad(-35.0))
        vis = make_visibility(
            nants=10, ntimes=8, nchan=1, rmax=300.0, phasecentre=pc
        )
        model = create_image_from_visibility(
            vis, npixel=128, oversampling=4.0, nchan=1
        )
        ra, dec = model.pixel_to_radec(128 // 2 + 9, 128 // 2 - 6)
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]], [[[1.5]]], vis.frequency
        )
        vis = dft_skycomponent_visibility(vis, comps)
        gt_true = create_gaintable_from_visibility(vis, jones_type="T")
        gt_true = _simulate_gaintable(gt_true, rng, phase_error=0.3)
        corrupted = apply_gaintable(vis, gt_true)

        path = str(tmp_path / "stream.svis")
        write_visibility(corrupted, path, chunk_times=2)

        kw = dict(
            nmajor=3, algorithm="hogbom", niter=200, gain=0.2,
            fractional_threshold=0.01,
        )
        current, residual, restored, gt = streamed_ical(
            path, model, pc, chunk_times=2,
            calibration_context="T", context="ng", **kw,
        )
        c0, r0, s0, g0 = ical(
            corrupted, model, calibration_context="T", context="ng",
            use_plan=True, **kw,
        )
        r_stream = float(jnp.max(jnp.abs(residual.pixels)))
        r_mem = float(jnp.max(jnp.abs(r0.pixels)))
        assert r_stream < 0.2, r_stream
        assert abs(r_stream - r_mem) < 0.02, (r_stream, r_mem)
        p_stream = float(jnp.max(restored.pixels))
        p_mem = float(jnp.max(s0.pixels))
        assert abs(p_stream - p_mem) < 0.05, (p_stream, p_mem)
        # slab-local solves == monolithic solves (interval-local NE):
        # per-time phases match the in-memory gaintable
        ga = np.asarray(g0["T"].gain)[..., 0, 0, 0]
        gb = np.asarray(gt.gain)[..., 0, 0, 0]
        assert ga.shape == gb.shape
        pa = ga * np.exp(-1j * np.angle(ga[:, :1]))
        pb = gb * np.exp(-1j * np.angle(gb[:, :1]))
        assert np.max(np.abs(pa - pb)) < 5e-3, np.max(np.abs(pa - pb))

    def test_streamed_uncached_matches_cached(self, tmp_path, rng):
        """cache_slabs=False (the 1B-scale re-streaming mode) must give
        identical results to the cached mode."""
        import jax.numpy as jnp

        from ska_sdp_func_python_tpu.models import SkyComponents
        from ska_sdp_func_python_tpu.ops import (
            create_image_from_visibility,
            dft_skycomponent_visibility,
        )
        from ska_sdp_func_python_tpu.streaming import streamed_ical

        pc = (0.0, np.deg2rad(-35.0))
        vis = make_visibility(
            nants=8, ntimes=6, nchan=1, rmax=300.0, phasecentre=pc
        )
        model = create_image_from_visibility(
            vis, npixel=64, oversampling=4.0, nchan=1
        )
        ra, dec = model.pixel_to_radec(64 // 2 + 5, 64 // 2 - 4)
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]], [[[1.0]]], vis.frequency
        )
        vis = dft_skycomponent_visibility(vis, comps)
        path = str(tmp_path / "uncached.svis")
        write_visibility(vis, path, chunk_times=2)
        kw = dict(
            nmajor=2, chunk_times=2, calibration_context="T",
            context="ng", algorithm="hogbom", niter=50, gain=0.2,
            fractional_threshold=0.01,
        )
        r_cached = streamed_ical(path, model, pc, cache_slabs=True, **kw)
        r_stream = streamed_ical(path, model, pc, cache_slabs=False, **kw)
        np.testing.assert_array_equal(
            np.asarray(r_cached.model.pixels),
            np.asarray(r_stream.model.pixels),
        )
        np.testing.assert_array_equal(
            np.asarray(r_cached.gaintable.gain),
            np.asarray(r_stream.gaintable.gain),
        )


class TestGainIO:
    """Standalone gaintable persistence (h5parm role of the reference's
    DP3 bridge, dp3_calibration.py:33-35)."""

    @staticmethod
    def _tables(rng):
        from ska_sdp_func_python_tpu.models.gaintable import (
            create_gaintable_from_visibility,
        )

        vis = make_visibility(nants=5, ntimes=6, nchan=2)
        gt_t = create_gaintable_from_visibility(vis, jones_type="T")
        g = np.asarray(gt_t.gain) * np.exp(
            1j * rng.normal(size=gt_t.gain.shape)
        )
        gt_t = gt_t.replace(gain=g.astype(np.complex64))
        gt_g = create_gaintable_from_visibility(
            vis, jones_type="G", timeslice=1e15
        )
        return {"T": gt_t, "G": gt_g}

    @pytest.mark.parametrize("ext", ["h5", "npz"])
    def test_roundtrip(self, tmp_path, rng, ext):
        from ska_sdp_func_python_tpu.io import (
            load_gaintables,
            save_gaintables,
        )

        tables = self._tables(rng)
        path = str(tmp_path / f"sols.{ext}")
        save_gaintables(tables, path)
        back = load_gaintables(path)
        assert sorted(back) == ["G", "T"]
        for k in tables:
            np.testing.assert_allclose(
                np.asarray(back[k].gain),
                np.asarray(tables[k].gain).astype(np.complex64),
                rtol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(back[k].time), np.asarray(tables[k].time)
            )
            assert back[k].jones_type == tables[k].jones_type
            assert back[k].receptor_frame == tables[k].receptor_frame

    def test_single_table_and_state(self, tmp_path, rng):
        from ska_sdp_func_python_tpu.io import load_gaintable, save_gaintable
        from ska_sdp_func_python_tpu.models.image import create_image
        from ska_sdp_func_python_tpu.pipeline import SelfCalState

        tables = self._tables(rng)
        path = str(tmp_path / "one.h5")
        save_gaintable(tables["T"], path)
        gt = load_gaintable(path)
        np.testing.assert_allclose(
            np.asarray(gt.gain),
            np.asarray(tables["T"].gain).astype(np.complex64),
            rtol=1e-6,
        )
        model = create_image(32, 1e-4, 15.0, -45.0)
        st = SelfCalState(model=model, gaintables=tables, cycle=2)
        spath = str(tmp_path / "state_sols.npz")
        st.export_gaintables(spath)
        st2 = SelfCalState.import_gaintables(model, spath, cycle=2)
        assert sorted(st2.gaintables) == ["G", "T"]


class TestH5parm:
    """losoto/DP3-conventions h5parm export (VERDICT r3 missing 5):
    solset group with antenna/source tables, numbered phase/amplitude
    soltabs, val/weight datasets carrying an AXES attribute."""

    def _tables(self, rng):
        from ska_sdp_func_python_tpu.models import (
            create_gaintable_from_visibility,
        )

        vis = make_visibility(nants=5, ntimes=6, nchan=2)
        gt_t = create_gaintable_from_visibility(vis, jones_type="T")
        g = np.asarray(gt_t.gain) * np.exp(
            1j * rng.normal(size=gt_t.gain.shape)
        )
        gt_t = gt_t.replace(gain=g.astype(np.complex64))
        gt_g = create_gaintable_from_visibility(
            vis, jones_type="G", timeslice=1e15
        )
        g2 = np.asarray(gt_g.gain) * (
            1.0 + 0.1 * rng.normal(size=gt_g.gain.shape)
        )
        gt_g = gt_g.replace(gain=g2.astype(np.complex64))
        return {"T": gt_t, "G": gt_g}

    def test_layout(self, tmp_path, rng):
        import h5py

        from ska_sdp_func_python_tpu.io import export_h5parm

        tables = self._tables(rng)
        path = str(tmp_path / "sols.h5parm")
        export_h5parm(tables, path)
        with h5py.File(path, "r") as fh:
            ss = fh["sol000"]
            ant = np.asarray(ss["antenna"])
            assert ant.dtype.names == ("name", "position")
            assert ant["position"].shape == (5, 3)
            src = np.asarray(ss["source"])
            assert src.dtype.names == ("name", "dir")
            for st in ("phase000", "amplitude000", "phase001"):
                assert st in ss, sorted(ss)
            v = ss["phase000"]["val"]
            axes = v.attrs["AXES"]
            axes = axes if isinstance(axes, bytes) else axes.encode()
            assert axes == b"time,ant,freq,dir,pol"
            assert ss["phase000"].attrs["TITLE"] in (b"phase", "phase")
            # T is scalar (1 pol), one solution channel; axes
            # [time, ant, freq, dir, pol]
            assert v.shape == (6, 5, 1, 1, 1)
            assert list(ss["phase000"]["ant"]) == [
                f"ANT{i:03d}".encode() for i in range(5)
            ]

    def test_roundtrip(self, tmp_path, rng):
        from ska_sdp_func_python_tpu.io import export_h5parm, import_h5parm

        tables = self._tables(rng)
        path = str(tmp_path / "sols.h5parm")
        export_h5parm(tables, path)
        back = import_h5parm(path)
        assert sorted(back) == ["G", "T"]
        for k in tables:
            np.testing.assert_allclose(
                np.asarray(back[k].gain),
                np.asarray(tables[k].gain).astype(np.complex64),
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(back[k].time), np.asarray(tables[k].time)
            )

    def test_full_jones_roundtrip(self, tmp_path, rng):
        from ska_sdp_func_python_tpu.io import export_h5parm, import_h5parm
        from ska_sdp_func_python_tpu.models import (
            create_gaintable_from_visibility,
        )

        from ska_sdp_func_python_tpu.models import GainTable

        nt, na, nf = 3, 4, 1
        g = np.tile(
            np.eye(2, dtype=np.complex64), (nt, na, nf, 1, 1)
        )
        g[..., 0, 1] = 0.1 + 0.05j
        g[..., 1, 0] = -0.07j
        gt = GainTable(
            gain=g,
            weight=np.ones_like(g, np.float32),
            residual=np.zeros((nt, nf, 2, 2), np.float32),
            time=np.arange(nt) * 10.0,
            interval=np.full(nt, 10.0),
            frequency=np.asarray([1.0e8]),
            jones_type="G",
        )
        path = str(tmp_path / "fj.h5parm")
        export_h5parm({"G": gt}, path)
        back = import_h5parm(path)["G"]
        np.testing.assert_allclose(
            np.asarray(back.gain), g, rtol=1e-5, atol=1e-6
        )
