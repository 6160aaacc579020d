"""Isolate the per-iteration cost inside the Pallas Hogbom loop:
  search : peak search reductions only (max, first-index, value)
  sub    : roll+mask subtraction only (peak position derived from i)
  full   : both (the real kernel structure)
Run: python bench_clean_probe.py [search sub full]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

NY = NX = 512
NITER = 1000


def make(variant):
    def kernel(dirty_ref, canvas_ref, out_ref):
        out_ref[...] = dirty_ref[...]
        canvas = canvas_ref[...]
        rr = jax.lax.broadcasted_iota(jnp.int32, (NY, NX), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (NY, NX), 1)
        lin = rr * NX + cc

        def body(i, acc):
            res = out_ref[...]
            if variant in ("search", "full"):
                search = jnp.abs(res)
                m = jnp.max(search)
                best = jnp.min(
                    jnp.where(search == m, lin, jnp.int32(NY * NX))
                )
                myi = best // NX
                mxi = best - myi * NX
                val = jnp.sum(jnp.where(lin == best, res, 0.0))
            else:
                myi = (i * 131) % NY
                mxi = (i * 137) % NX
                val = jnp.float32(1.0) + acc * 1e-30
            if variant in ("sub", "full"):
                mval = val * 0.1
                rolled = pltpu.roll(pltpu.roll(canvas, myi, 0), mxi, 1)
                dy = rr - myi
                dx = cc - mxi
                valid = (dy >= -NY // 2) & (dy < NY // 2) & \
                        (dx >= -NX // 2) & (dx < NX // 2)
                out_ref[...] = res - jnp.where(valid, rolled, 0.0) * mval
            else:
                # touch res cheaply so the loop isn't dead
                out_ref[0:1, :] = res[0:1, :] + val * 1e-30
            return acc + val

        acc = jax.lax.fori_loop(0, NITER, body, jnp.float32(0.0))
        out_ref[0:1, :] = out_ref[0:1, :] + acc * 1e-30

    return kernel


def run(variant, d, c):
    f = jax.jit(
        lambda d, c: pl.pallas_call(
            make(variant),
            out_shape=jax.ShapeDtypeStruct((NY, NX), jnp.float32),
        )(d, c)
    )
    t0 = time.time()
    np.asarray(f(d, c))
    print(f"{variant}: compile+first {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(d, c))
        best = min(best, time.time() - t0)
    print(f"{variant}: {best*1e3:.1f} ms -> {best/NITER*1e6:.2f} us/iter",
          flush=True)


def main():
    which = sys.argv[1:] or ["search", "sub", "full"]
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=(NY, NX)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(NY, NX)).astype(np.float32))
    for v in which:
        run(v, d, c)


if __name__ == "__main__":
    main()
