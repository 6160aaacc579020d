"""Fused vs tiled degrid at the BASELINE predict config (10M vis, 1024^2,
8 w-planes, linear w)."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from ska_sdp_func_python_tpu.ops.imaging import predict_core

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
img = jnp.asarray(rng.normal(size=(npixel, npixel)).astype(np.float32))

def make(gridder):
    @jax.jit
    def run(u, v, w, img):
        vis = predict_core(
            u, v, w, img, cellsize=cellsize, support=support,
            nw=nw, do_wstacking=True, gridder=gridder)
        return jnp.real(vis), jnp.imag(vis)
    return run

for name in (sys.argv[1:] or ["fused", "tiled"]):
    run = make(name)
    t0 = time.perf_counter()
    vr, vi = run(u, v, w, img)
    cks = float(np.asarray(jnp.sum(jnp.abs(vr))) + np.asarray(jnp.sum(jnp.abs(vi))))
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s checksum {cks:.6g}", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        vr, vi = run(u, v, w, img)
        float(np.asarray(vr[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: best {best*1e3:.1f} ms  {nvis/best/1e6:.1f} Mvis/s", flush=True)
