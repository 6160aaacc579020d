"""DMA-window probes for the CLEAN kernels.

  dmaA  HBM->VMEM window, dynamic sublane offset only (lane offset 0)
  dmaB  dynamic sublane + LANE offsets
  dmaC  dynamic sublane + 128-aligned lane offset
Run: python bench_clean_probe3.py [dmaA dmaB dmaC]
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


def kernel(dirty_ref, canvas2_ref, out_ref, scratch, sem, *, mode):
    out_ref[...] = dirty_ref[...]

    def body(i, acc):
        res = out_ref[...]
        oy = (i * 131) % NY
        if mode == "A":
            ox = 0
        elif mode == "B":
            ox = (i * 137) % NX
        else:
            ox = ((i * 137) % NX) // 128 * 128
        dma = pltpu.make_async_copy(
            canvas2_ref.at[pl.ds(oy, NY), pl.ds(ox, NX)], scratch, sem
        )
        dma.start()
        dma.wait()
        out_ref[...] = res - scratch[...] * (1e-30 * (1.0 + acc))
        return acc + 1.0

    acc = jax.lax.fori_loop(0, NITER, body, jnp.float32(0.0))
    out_ref[0:1, :] = out_ref[0:1, :] + acc * 1e-30


def run(tag, mode, d, c2, reps=3):
    f = jax.jit(
        lambda *a: pl.pallas_call(
            partial(kernel, mode=mode),
            out_shape=jax.ShapeDtypeStruct((NY, NX), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((NY, NX), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(*a)
    )
    t0 = time.time()
    np.asarray(f(d, c2))
    print(f"{tag}: compile+first {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        np.asarray(f(d, c2))
        best = min(best, time.time() - t0)
    print(f"{tag}: {best*1e3:.1f} ms total (incl ~30ms fixed)", flush=True)


def main():
    which = sys.argv[1:] or ["dmaA", "dmaB", "dmaC"]
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=(NY, NX)).astype(np.float32))
    c2 = jnp.asarray(rng.normal(size=(2 * NY, 2 * NX)).astype(np.float32))
    for tag in which:
        mode = tag[-1]
        try:
            run(tag, mode, d, c2)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
