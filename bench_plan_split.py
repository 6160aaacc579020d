"""Steady-state invert stage split on the plan path at the BASELINE
config: Pallas grid kernel vs IFFT + w-beam tail.

Run: python bench_plan_split.py
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
    uv_grids_to_dirty,
)
from ska_sdp_func_python_tpu.ops.gridding_plan import (
    grid_with_plan,
    sort_values,
)

NVIS = int(10e6)
NPIX = 1024
CELL = 5e-5
NW = 8
PADDING = float(__import__("sys").argv[1]) if len(__import__("sys").argv) > 1 else 2.0
CHUNK = int(__import__("sys").argv[2]) if len(__import__("sys").argv) > 2 else 512


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0].ravel()[0]
    return float(np.asarray(jnp.real(leaf)))


def timeit(name, fn, *args, reps=4):
    t0 = time.perf_counter()
    fetch(fn(*args))
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: best {best*1e3:.1f} ms (incl ~27ms dispatch)",
          flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    umax = 0.33 / CELL / 2
    u = jnp.asarray(rng.uniform(-umax, umax, NVIS).astype(np.float32))
    v = jnp.asarray(rng.uniform(-umax, umax, NVIS).astype(np.float32))
    w = jnp.asarray(rng.uniform(-60.0, 60.0, NVIS).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=NVIS).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=NVIS).astype(np.float32))

    t0 = time.perf_counter()
    plan = make_imaging_plan(
        u, v, w, npixel=NPIX, cellsize=CELL, support=8, nw=NW,
        do_wstacking=True, padding=PADDING, chunk=CHUNK,
    )
    print("npad:", plan.npad, flush=True)
    jax.block_until_ready(plan.gp.geo)
    print(f"plan build: {time.perf_counter()-t0:.1f}s", flush=True)
    vals = jax.jit(lambda a, b: jax.lax.complex(a, b))(vr, vi)
    vals_s = sort_values(plan.gp, vals)
    jax.block_until_ready(vals_s)

    grids = grid_with_plan(plan.gp, vals_s, values_sorted=True)
    jax.block_until_ready(grids)
    print("grids shape:", grids.shape, flush=True)

    timeit("grid kernel (values sorted)",
           lambda vs: grid_with_plan(plan.gp, vs, values_sorted=True),
           vals_s)
    timeit("ifft + w-beam tail", lambda g: uv_grids_to_dirty(plan, g),
           grids)
    timeit("full invert_with_plan (sorted)",
           lambda vs: invert_with_plan(plan, vs, values_sorted=True)[0],
           vals_s)


if __name__ == "__main__":
    main()
