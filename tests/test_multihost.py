"""Two-process multi-host integration test (VERDICT round-1 item 3).

Spawns two real OS processes, each owning one CPU device, connected by
the jax.distributed runtime. They run the production
``parallel.sharded_ical`` (baseline-sharded fused self-cal) with
process-local shard construction and cross-process collectives, and the
result must match the single-process 2-device run.
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))



def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_ical(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mh.npz")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(HERE, "_multihost_worker.py"),
                str(pid),
                "2",
                f"127.0.0.1:{port}",
                out,
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, tail in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{tail[-4000:]}"
    got = np.load(out)

    # single-process 2-device reference on the virtual CPU mesh
    import jax

    from simul import make_visibility
    from test_solvers import _simulate_gaintable

    from ska_sdp_func_python_tpu.models import (
        SkyComponents,
        create_gaintable_from_visibility,
    )
    from ska_sdp_func_python_tpu.ops import (
        apply_gaintable,
        create_image_from_visibility,
        dft_skycomponent_visibility,
    )
    from ska_sdp_func_python_tpu.parallel import make_mesh, sharded_ical

    rng = np.random.default_rng(1805550721)
    pc = (0.0, np.deg2rad(-35.0))
    vis = make_visibility(
        nants=10, ntimes=4, nchan=1, rmax=300.0, phasecentre=pc
    )
    model = create_image_from_visibility(
        vis, npixel=128, oversampling=4.0, nchan=1
    )
    ra, dec = model.pixel_to_radec(128 // 2 + 9, 128 // 2 - 6)
    comps = SkyComponents.from_lists(
        [[float(ra), float(dec)]], [[[1.3]]], vis.frequency
    )
    vis = dft_skycomponent_visibility(vis, comps)
    gt_true = create_gaintable_from_visibility(vis, jones_type="T")
    gt_true = _simulate_gaintable(gt_true, rng, phase_error=0.3)
    corrupted = apply_gaintable(vis, gt_true)
    mesh = make_mesh(shape=(2,), devices=jax.devices()[:2])
    current, residual, restored, gts = sharded_ical(
        corrupted,
        model,
        mesh,
        context="ng",
        nmajor=3,
        calibration_context="T",
        algorithm="hogbom",
        niter=200,
        gain=0.2,
        fractional_threshold=0.01,
    )
    # identical SPMD program, identical shards; only the runtime differs
    # (2 processes over gRPC vs 1 process), so results match tightly
    assert np.max(np.abs(got["model"] - np.asarray(current.pixels))) < 1e-7
    assert (
        np.max(np.abs(got["residual"] - np.asarray(residual.pixels)))
        < 1e-7
    )
    ga = np.asarray(gts["T"].gain)[..., 0, 0]
    gb = got["gain"][..., 0, 0]
    pa = ga * np.exp(-1j * np.angle(ga[:, :1]))
    pb = gb * np.exp(-1j * np.angle(gb[:, :1]))
    assert np.max(np.abs(pa - pb)) < 1e-7
    assert float(np.max(np.abs(got["residual"]))) < 0.2


def test_two_process_streamed_ical(tmp_path):
    """streamed_ical(distribute=True) across two real processes — each
    streams its round-robin slab share from its own store handle, psums
    uv grids once per cycle — must match the single-process run."""
    import jax

    from simul import make_visibility
    from test_solvers import _simulate_gaintable

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
    from ska_sdp_func_python_tpu.streaming import streamed_ical

    rng = np.random.default_rng(20260819)
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
    store = str(tmp_path / "mh_stream.svis")
    write_visibility(corrupted, store, chunk_times=2)

    # single-process reference (same store, same parameters)
    ref_c, ref_r, _, ref_gt = streamed_ical(
        store, model, pc, chunk_times=2,
        calibration_context="T", context="ng",
        nmajor=2, algorithm="hogbom", niter=150, gain=0.2,
        fractional_threshold=0.01,
    )

    port = _free_port()
    out = str(tmp_path / "mh_stream.npz")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(HERE, "_streamed_mh_worker.py"),
                str(pid),
                "2",
                f"127.0.0.1:{port}",
                store,
                out,
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, tail in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{tail[-4000:]}"
    got = np.load(out)
    np.testing.assert_allclose(
        got["residual"], np.asarray(ref_r.pixels), atol=1e-7
    )
    np.testing.assert_allclose(
        got["model"], np.asarray(ref_c.pixels), atol=1e-7
    )
    np.testing.assert_allclose(
        got["gain"], np.asarray(ref_gt.gain), atol=1e-7
    )
    np.testing.assert_allclose(got["gtime"], np.asarray(ref_gt.time))


def test_two_process_streamed_tg_cube(tmp_path):
    """Widened-scope 2-process streamed run: 3-channel spectral cube +
    "TG" chain — per-channel plans, two Jones terms per slab, psum'd
    per-channel grids — must match the single-process run."""
    from simul import make_visibility
    from test_solvers import _simulate_gaintable

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
    from ska_sdp_func_python_tpu.streaming import streamed_ical

    rng = np.random.default_rng(20260820)
    pc = (0.0, np.deg2rad(-35.0))
    vis = make_visibility(
        nants=8, ntimes=8, nchan=3, rmax=300.0, phasecentre=pc
    )
    model = create_image_from_visibility(
        vis, npixel=64, oversampling=4.0, nchan=3
    )
    ra, dec = model.pixel_to_radec(64 // 2 + 5, 64 // 2 - 4)
    comps = SkyComponents.from_lists(
        [[float(ra), float(dec)]], [[[1.5]] * 3], vis.frequency
    )
    vis = dft_skycomponent_visibility(vis, comps)
    gt_t = create_gaintable_from_visibility(vis, jones_type="T")
    gt_t = _simulate_gaintable(gt_t, rng, phase_error=0.25)
    gt_g = create_gaintable_from_visibility(
        vis, jones_type="G", timeslice=60.0
    )
    gt_g = _simulate_gaintable(
        gt_g, rng, phase_error=0.0, amplitude_error=0.08
    )
    corrupted = apply_gaintable(apply_gaintable(vis, gt_g), gt_t)
    store = str(tmp_path / "mh_tg.svis")
    write_visibility(corrupted, store, chunk_times=2)

    ref_c, ref_r, _, ref_gts = streamed_ical(
        store, model, pc, chunk_times=2,
        calibration_context="TG", context="ng",
        nmajor=2, algorithm="hogbom", niter=150, gain=0.2,
        fractional_threshold=0.01,
    )

    port = _free_port()
    out = str(tmp_path / "mh_tg.npz")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(HERE, "_streamed_mh_worker.py"),
                str(pid),
                "2",
                f"127.0.0.1:{port}",
                store,
                out,
                "tg_cube",
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, tail in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{tail[-4000:]}"
    got = np.load(out)
    # two Jones terms x two cycles accumulate slightly more
    # reduction-order noise than the single-term test (measured 1.3e-7)
    np.testing.assert_allclose(
        got["residual"], np.asarray(ref_r.pixels), atol=5e-7
    )
    np.testing.assert_allclose(
        got["model"], np.asarray(ref_c.pixels), atol=5e-7
    )
    np.testing.assert_allclose(
        got["gain"], np.asarray(ref_gts["T"].gain), atol=5e-7
    )
