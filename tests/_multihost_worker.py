"""Worker process for the two-process multi-host integration test.

Usage: python _multihost_worker.py <process_id> <num_processes>
           <coordinator_addr> <out_npz>

Each process owns ONE CPU device; together they form a 2-device global
mesh. Process-local shard construction + DCN-style collectives run the
REAL production `parallel.sharded_ical`; process 0 writes the results
for the parent test to compare against a single-process run.
"""

import os
import sys

# one CPU device per process: the global mesh is (num_processes,)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=1"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(HERE))


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    out = sys.argv[4]

    from ska_sdp_func_python_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc, jax.devices()

    import jax.numpy as jnp
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
    from ska_sdp_func_python_tpu.parallel import sharded_ical

    # identical deterministic observation on every process
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

    mesh = multihost.global_mesh(axis_names=("data",))
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
    if pid == 0:
        np.savez(
            out,
            model=np.asarray(current.pixels),
            residual=np.asarray(residual.pixels),
            restored=np.asarray(restored.pixels),
            gain=np.asarray(gts["T"].gain),
        )
    # make every process block until results are materialised
    print(
        f"worker {pid}: peak residual "
        f"{float(jnp.max(jnp.abs(residual.pixels))):.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
