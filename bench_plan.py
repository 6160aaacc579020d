"""Planned invert/predict at the BASELINE config (10M vis, 1024^2, 8
w-planes): plan build cost, per-call cost in original order, and per-call
cost in the sorted domain (major-cycle pattern)."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from ska_sdp_func_python_tpu.ops.imaging import (
    make_imaging_plan, invert_with_plan, predict_with_plan,
)
from ska_sdp_func_python_tpu.ops.gridding_plan import sort_values

rng = np.random.default_rng(7)
nvis = int(10e6)
npixel = 1024
cellsize = 5e-5
kw = dict(npixel=npixel, cellsize=cellsize, support=8, nw=8,
          do_wstacking=True)
scale = npixel * cellsize
umax = 0.33 * npixel / scale / 2
u = jnp.asarray(rng.uniform(-umax, umax, nvis).astype(np.float32))
v = jnp.asarray(rng.uniform(-umax, umax, nvis).astype(np.float32))
w = jnp.asarray(rng.uniform(-50.0, 50.0, nvis).astype(np.float32))
vr = jnp.asarray(rng.normal(size=nvis).astype(np.float32))
vi = jnp.asarray(rng.normal(size=nvis).astype(np.float32))
wgt = jnp.ones(nvis, dtype=jnp.float32)
img = jnp.asarray(rng.normal(size=(npixel, npixel)).astype(np.float32))

def timeit(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(jnp.real(leaf.ravel()[0])))
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(jnp.real(leaf.ravel()[0])))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: best {best*1e3:8.1f} ms  {nvis/best/1e6:6.1f} Mvis/s",
          flush=True)
    return out

which = set(sys.argv[1:] or ["build", "invert", "predict", "sorted"])
plan = timeit("plan build", lambda: make_imaging_plan(u, v, w, **kw))
if "invert" in which:
    vals = jax.jit(jax.lax.complex)(vr, vi)
    timeit("invert_with_plan", invert_with_plan, plan, vals, wgt)
if "predict" in which:
    timeit("predict_with_plan", predict_with_plan, plan, img)
if "sorted" in which:
    vals = jax.jit(jax.lax.complex)(vr, vi)
    vals_s = sort_values(plan.gp, vals)
    wgt_s = jnp.real(sort_values(plan.gp, wgt))
    timeit("invert sorted-domain",
           lambda: invert_with_plan(plan, vals_s, wgt_s,
                                    values_sorted=True))
    timeit("predict sorted-domain",
           lambda: predict_with_plan(plan, img, to_sorted=True))
