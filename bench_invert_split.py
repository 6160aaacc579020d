"""Split the steady-state invert at the BASELINE config into
(grid kernel) vs (IFFT + w-beam tail): times grid_with_plan alone and
full invert_with_plan, both chained K inside one jit (the axon tunnel
adds ~27 ms fixed per dispatch).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from ska_sdp_func_python_tpu.ops.gridding_plan import (
    grid_with_plan,
    sort_values,
)
from ska_sdp_func_python_tpu.ops.imaging import (
    invert_with_plan,
    make_imaging_plan,
)

K = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("chunk", nargs="?", type=int, default=512)
    ap.add_argument("tile", nargs="?", type=int, default=0)
    ap.add_argument("prec", nargs="?", default="config")
    ap.add_argument("--predict", action="store_true")
    # accept legacy "predict" as a bare word anywhere on the command line
    argv = [a for a in sys.argv[1:] if a != "predict"]
    args = ap.parse_args(argv)
    args.predict = args.predict or "predict" in sys.argv
    chunk, tile, prec = args.chunk, args.tile, args.prec
    if tile:
        import ska_sdp_func_python_tpu.ops.imaging as imaging_mod

        imaging_mod._tile_for = lambda npad: tile
    print(
        f"config: chunk={chunk} tile={tile or 'default'} prec={prec}",
        flush=True,
    )
    rng = np.random.default_rng(7)
    nvis = int(10e6)
    npixel = 1024
    cellsize = 5e-5
    scale = npixel * cellsize
    umax = 0.33 * npixel / scale / 2
    u = jnp.asarray(rng.uniform(-umax, umax, nvis).astype(np.float32))
    v = jnp.asarray(rng.uniform(-umax, umax, nvis).astype(np.float32))
    w = jnp.asarray(rng.uniform(-50.0, 50.0, nvis).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=nvis).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=nvis).astype(np.float32))
    wgt = jnp.ones(nvis, dtype=jnp.float32)

    plan = make_imaging_plan(
        u, v, w, npixel=npixel, cellsize=cellsize, support=8, nw=8,
        do_wstacking=True, padding=1.25, chunk=chunk,
    )
    vals0 = jax.jit(jax.lax.complex)(vr, vi)
    vs = sort_values(plan.gp, vals0)
    vs_r = jax.jit(jnp.real)(vs)
    vs_i = jax.jit(jnp.imag)(vs)

    @jax.jit
    def run_grid_only(gp, vr_s, vi_s):
        vals = jax.lax.complex(vr_s, vi_s)
        acc = None
        for _ in range(K):
            g = grid_with_plan(gp, vals, values_sorted=True, precision=prec)
            eps = jnp.real(g[0, 0, 0]) * jnp.float32(1e-30)
            vals = vals + jax.lax.complex(eps, eps)
            acc = g if acc is None else acc + g
        return acc

    @jax.jit
    def run_full(plan, vr_s, vi_s, wgt):
        vals = jax.lax.complex(vr_s, vi_s)
        acc = None
        for _ in range(K):
            d, s = invert_with_plan(
                plan, vals, wgt, values_sorted=True, precision=prec
            )
            eps = d[0, 0] * jnp.float32(1e-30)
            vals = vals + jax.lax.complex(eps, eps)
            acc = d if acc is None else acc + d
        return acc

    @jax.jit
    def noop(x):
        return x + 1.0

    def fetch(x):
        return float(np.asarray(jnp.real(x.ravel()[0])))

    def best_of(fn, *args, reps=3):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        print(f"  compile+first {time.perf_counter()-t0:.1f}s", flush=True)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    fetch(noop(jnp.float32(0.0)))
    overhead = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(noop(jnp.float32(0.0)))
        overhead = min(overhead, time.perf_counter() - t0)
    print(f"dispatch overhead {overhead*1e3:.1f} ms", flush=True)

    tg = (best_of(run_grid_only, plan.gp, vs_r, vs_i) - overhead) / K
    print(f"grid kernel only: {tg*1e3:.1f} ms", flush=True)
    tf = (best_of(run_full, plan, vs_r, vs_i, wgt) - overhead) / K
    print(
        f"full invert: {tf*1e3:.1f} ms -> tail (ifft+wbeam+corr): "
        f"{(tf-tg)*1e3:.1f} ms",
        flush=True,
    )

    if args.predict:
        from ska_sdp_func_python_tpu.ops.imaging import predict_with_plan

        img = jnp.zeros((npixel, npixel), jnp.float32).at[
            npixel // 2, npixel // 2
        ].set(1.0)

        @jax.jit
        def run_predict(plan, img):
            acc = None
            for _ in range(K):
                vv = predict_with_plan(
                    plan, img, to_sorted=True, precision=prec
                )
                img = img + jnp.real(vv[0]) * jnp.float32(1e-30)
                acc = vv if acc is None else acc + vv
            return acc

        tp = (best_of(run_predict, plan, img) - overhead) / K
        print(
            f"full predict (to_sorted): {tp*1e3:.1f} ms = "
            f"{nvis/tp/1e6:.1f} Mvis/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
