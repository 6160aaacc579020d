"""Per-call stage split of the plan-based invert at the BASELINE config.

Stages (plan prebuilt; each timed in steady state):
  sort  = sort_values (3-operand rank sort, the per-call value sort)
  grid  = grid_with_plan(values_sorted=True)   (pure Pallas segment kernel)
  full  = invert_with_plan(values_sorted=True) (grid + batched ifft + w-stack)
  total = invert_with_plan(values_sorted=False)

Run: python bench_plan_stages.py [sort grid full total ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from ska_sdp_func_python_tpu.ops.imaging import (
    invert_with_plan,
    make_imaging_plan,
)
from ska_sdp_func_python_tpu.ops.gridding_plan import (
    grid_with_plan,
    sort_values,
)

NVIS = int(10e6)
NPIX = 1024
CELL = 5e-5
NW = 8
SUPPORT = 8


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0].ravel()[0]
    return float(np.asarray(jnp.real(leaf)))


def timeit(name, fn, *args, reps=3, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    fetch(out)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: best {best*1e3:.1f} ms  ({NVIS/best/1e6:.1f} Mvis/s)",
          flush=True)
    return out


def main():
    which = sys.argv[1:] or ["sort", "grid", "full", "total"]
    rng = np.random.default_rng(7)
    scale = NPIX * CELL
    umax = 0.33 * NPIX / scale / 2
    u = jnp.asarray(rng.uniform(-umax, umax, NVIS).astype(np.float32))
    v = jnp.asarray(rng.uniform(-umax, umax, NVIS).astype(np.float32))
    w = jnp.asarray(rng.uniform(-50.0, 50.0, NVIS).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=NVIS).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=NVIS).astype(np.float32))
    vals = jax.jit(jax.lax.complex)(vr, vi)

    t0 = time.perf_counter()
    plan = make_imaging_plan(
        u, v, w, npixel=NPIX, cellsize=CELL, support=SUPPORT, nw=NW,
        do_wstacking=True,
    )
    fetch(plan.gp.rank)
    print(f"plan build (compile+first): {time.perf_counter()-t0:.1f}s",
          flush=True)

    vs = sort_values(plan.gp, vals)
    fetch(vs)

    if "sort" in which:
        timeit("sort", sort_values, plan.gp, vals)
    if "grid" in which:
        timeit("grid", grid_with_plan, plan.gp, vs, values_sorted=True)
    if "full" in which:
        timeit("full(sorted)", invert_with_plan, plan, vs,
               values_sorted=True)
    if "total" in which:
        timeit("total", invert_with_plan, plan, vals)


if __name__ == "__main__":
    main()
