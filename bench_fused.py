"""Compare the fused Pallas gridder vs the XLA tiled path at the
BASELINE invert config (10M vis, 1024^2, 8 w-planes, linear w)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from ska_sdp_func_python_tpu.ops.imaging import invert_core


def main():
    rng = np.random.default_rng(7)
    nvis = int(10e6)
    npixel = 1024
    cellsize = 5e-5
    nw = 8
    support = 8

    scale = npixel * cellsize
    umax = 0.33 * npixel / scale / 2
    u = jnp.asarray(rng.uniform(-umax, umax, nvis).astype(np.float32))
    v = jnp.asarray(rng.uniform(-umax, umax, nvis).astype(np.float32))
    w = jnp.asarray(rng.uniform(-50.0, 50.0, nvis).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=nvis).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=nvis).astype(np.float32))
    wgt = jnp.ones(nvis, dtype=jnp.float32)

    def make(gridder):
        @jax.jit
        def run(u, v, w, vr, vi, wgt):
            vals = jax.lax.complex(vr, vi)
            return invert_core(
                u, v, w, vals, wgt,
                npixel=npixel, cellsize=cellsize, support=support,
                nw=nw, do_wstacking=True, gridder=gridder,
            )
        return run

    results = {}
    for name in (sys.argv[1:] or ["fused", "tiled"]):
        run = make(name)
        t0 = time.perf_counter()
        d, s = run(u, v, w, vr, vi, wgt)
        checksum = float(np.asarray(jnp.sum(jnp.abs(d))))
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s "
              f"checksum {checksum:.6g}", flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            d, s = run(u, v, w, vr, vi, wgt)
            float(np.asarray(jnp.max(jnp.abs(d))))
            times.append(time.perf_counter() - t0)
        best = min(times)
        results[name] = (best, checksum)
        print(f"{name}: best {best*1e3:.1f} ms  "
              f"{nvis/best/1e6:.2f} Mvis/s", flush=True)
    if len(results) == 2:
        a, b = results["fused"][0], results["tiled"][0]
        print(f"fused/tiled speedup: {b/a:.2f}x; checksums "
              f"{results['fused'][1]:.6g} vs {results['tiled'][1]:.6g}")


if __name__ == "__main__":
    main()
