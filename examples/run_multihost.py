"""Launch a multi-process (multi-host style) sharded self-cal.

On a real pod slice, run one process per host with the standard jax
env (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID or
your cluster's auto-detection) and call ``parallel.multihost.initialize``
before touching any device. This example demonstrates the same
multi-controller program on ONE machine with two CPU processes
(exactly what tests/test_multihost.py asserts against the
single-process result):

    python examples/run_multihost.py            # spawns 2 workers

Each process constructs ONLY its own baseline shards (gridding plans,
sorted streams), and the per-cycle collectives are two psums (normal
equations + uv grids) riding ICI/DCN — per-cycle traffic is
O(nants^2 + grid), independent of the visibility count.
"""

import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(
    os.path.dirname(HERE), "tests", "_multihost_worker.py"
)


def main():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    out = "/tmp/multihost_demo.npz"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                WORKER,
                str(pid),
                "2",
                f"127.0.0.1:{port}",
                out,
            ],
            env=env,
        )
        for pid in (0, 1)
    ]
    rc = [p.wait() for p in procs]
    if any(rc):
        raise SystemExit(f"worker failure: {rc}")
    import numpy as np

    got = np.load(out)
    print(
        f"2-process sharded_ical done: restored peak "
        f"{got['restored'].max():.4f} Jy, peak residual "
        f"{np.abs(got['residual']).max():.6f}"
    )


if __name__ == "__main__":
    main()
