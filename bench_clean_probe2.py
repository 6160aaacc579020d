"""Finer isolation of Pallas Hogbom iteration costs.

Variants:
  m1     one max-reduction + scalar extract per iter
  m2     max + min-index reductions (sign packed into the index)
  sub0   dynamic roll along axis 0 only (sublanes)
  sub1   dynamic roll along axis 1 only (lanes)
  subds  patch via dynamic_slice from a [2ny,2nx] VMEM canvas
  subdma patch via async DMA window from an HBM canvas
Run: python bench_clean_probe2.py [m1 m2 sub0 sub1 subds subdma]
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


def kernel_m(dirty_ref, canvas_ref, out_ref, *, two):
    out_ref[...] = dirty_ref[...]
    rr = jax.lax.broadcasted_iota(jnp.int32, (NY, NX), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (NY, NX), 1)
    lin2 = (rr * NX + cc) * 2

    def body(i, acc):
        res = out_ref[...]
        search = jnp.abs(res)
        m = jnp.max(search)
        if two:
            key = jnp.where(
                search == m,
                lin2 + jnp.where(res < 0, 1, 0),
                jnp.int32(2 * NY * NX),
            )
            best2 = jnp.min(key)
            sgn = 1.0 - 2.0 * (best2 & 1).astype(jnp.float32)
            val = sgn * m
        else:
            val = m
        out_ref[0:1, :] = res[0:1, :] + val * 1e-30
        return acc + val

    acc = jax.lax.fori_loop(0, NITER, body, jnp.float32(0.0))
    out_ref[0:1, :] = out_ref[0:1, :] + acc * 1e-30


def kernel_sub(dirty_ref, canvas_ref, out_ref, *, axis):
    out_ref[...] = dirty_ref[...]
    canvas = canvas_ref[...]

    def body(i, acc):
        res = out_ref[...]
        s = (i * 131) % NY
        if axis == 0:
            rolled = pltpu.roll(canvas, s, 0)
        else:
            rolled = pltpu.roll(canvas, s, 1)
        out_ref[...] = res - rolled * (1e-30 * (1.0 + acc))
        return acc + 1.0

    acc = jax.lax.fori_loop(0, NITER, body, jnp.float32(0.0))
    out_ref[0:1, :] = out_ref[0:1, :] + acc * 1e-30


def kernel_subds(dirty_ref, canvas2_ref, out_ref):
    # canvas2 [2NY, 2NX] in VMEM; dynamic_slice window
    out_ref[...] = dirty_ref[...]

    def body(i, acc):
        res = out_ref[...]
        oy = (i * 131) % NY
        ox = (i * 137) % NX
        patch = canvas2_ref[pl.ds(oy, NY), pl.ds(ox, NX)]
        out_ref[...] = res - patch * (1e-30 * (1.0 + acc))
        return acc + 1.0

    acc = jax.lax.fori_loop(0, NITER, body, jnp.float32(0.0))
    out_ref[0:1, :] = out_ref[0:1, :] + acc * 1e-30


def kernel_subdma(dirty_ref, canvas2_ref, out_ref, scratch, sem):
    out_ref[...] = dirty_ref[...]

    def body(i, acc):
        res = out_ref[...]
        oy = (i * 131) % NY
        ox = (i * 137) % NX
        dma = pltpu.make_async_copy(
            canvas2_ref.at[pl.ds(oy, NY), pl.ds(ox, NX)], scratch, sem
        )
        dma.start()
        dma.wait()
        out_ref[...] = res - scratch[...] * (1e-30 * (1.0 + acc))
        return acc + 1.0

    acc = jax.lax.fori_loop(0, NITER, body, jnp.float32(0.0))
    out_ref[0:1, :] = out_ref[0:1, :] + acc * 1e-30


def run(variant, d, c, c2):
    if variant in ("m1", "m2"):
        kern = partial(kernel_m, two=variant == "m2")
        args, extra = (d, c), {}
    elif variant in ("sub0", "sub1"):
        kern = partial(kernel_sub, axis=0 if variant == "sub0" else 1)
        args, extra = (d, c), {}
    elif variant == "subds":
        kern = kernel_subds
        args, extra = (d, c2), {}
    elif variant == "subdma":
        kern = kernel_subdma
        args = (d, c2)
        extra = dict(
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((NY, NX), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
    f = jax.jit(
        lambda *a: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((NY, NX), jnp.float32),
            **extra,
        )(*a)
    )
    t0 = time.time()
    np.asarray(f(*args))
    print(f"{variant}: compile+first {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(*args))
        best = min(best, time.time() - t0)
    print(f"{variant}: {best*1e3:.1f} ms -> {best/NITER*1e6:.2f} us/iter",
          flush=True)


def main():
    which = sys.argv[1:] or ["m1", "m2", "sub0", "sub1", "subds", "subdma"]
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=(NY, NX)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(NY, NX)).astype(np.float32))
    c2 = jnp.asarray(rng.normal(size=(2 * NY, 2 * NX)).astype(np.float32))
    for v in which:
        try:
            run(v, d, c, c2)
        except Exception as e:
            print(f"{variant if False else v}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
