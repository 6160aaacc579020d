"""Worker for the two-process STREAMED self-cal integration test.

Usage: python _streamed_mh_worker.py <pid> <nproc> <coord> <store> <out>

Each process opens the SAME native visibility store, streams only its
round-robin share of the time slabs (``streamed_ical(distribute=True)``)
and participates in the once-per-cycle cross-process psum. Process 0
writes the results for the parent test to compare against the
single-process run.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

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
    store = sys.argv[4]
    out = sys.argv[5]
    scenario = sys.argv[6] if len(sys.argv) > 6 else "basic"

    from ska_sdp_func_python_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()

    from ska_sdp_func_python_tpu.ops import create_image_from_visibility
    from ska_sdp_func_python_tpu.streaming import streamed_ical
    from simul import make_visibility

    pc = (0.0, np.deg2rad(-35.0))
    if scenario == "tg_cube":
        # widened scope: 3-channel spectral cube + "TG" chain
        vis = make_visibility(
            nants=8, ntimes=8, nchan=3, rmax=300.0, phasecentre=pc
        )
        model = create_image_from_visibility(
            vis, npixel=64, oversampling=4.0, nchan=3
        )
        context = "TG"
    else:
        vis = make_visibility(
            nants=10, ntimes=8, nchan=1, rmax=300.0, phasecentre=pc
        )
        model = create_image_from_visibility(
            vis, npixel=128, oversampling=4.0, nchan=1
        )
        context = "T"
    current, residual, restored, gt = streamed_ical(
        store, model, pc, chunk_times=2,
        calibration_context=context, context="ng",
        nmajor=2, algorithm="hogbom", niter=150, gain=0.2,
        fractional_threshold=0.01, distribute=True,
    )
    if pid == 0:
        g0 = gt[context[0]] if isinstance(gt, dict) else gt
        np.savez(
            out,
            model=np.asarray(current.pixels),
            residual=np.asarray(residual.pixels),
            gain=np.asarray(g0.gain),
            gtime=np.asarray(g0.time),
        )
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
