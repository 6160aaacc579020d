"""Round-3 grid-kernel probe: slot kernel only vs +assemble vs full invert.

Usage: python bench_t3_probe.py [--tile N] [--chunk N] [--prec P]
       [--stages kern,kasm,grid,full]
All stages chained K=4 inside one jit; dispatch overhead subtracted.
"""

import argparse
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

K = 4
NVIS = int(10e6)
NPIX = 1024
CELL = 5e-5
NW = 8
SUPPORT = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=0)
    ap.add_argument("--npad", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--prec", default="config")
    ap.add_argument("--stages", default="kern,kasm,full")
    args = ap.parse_args()

    import ska_sdp_func_python_tpu.ops.imaging as imaging_mod
    from ska_sdp_func_python_tpu.ops import gridding_fused as gf
    from ska_sdp_func_python_tpu.ops.gridding_plan import (
        grid_with_plan,
        sort_values,
    )
    from ska_sdp_func_python_tpu.ops.imaging import (
        invert_with_plan,
        make_imaging_plan,
    )

    if args.tile:
        imaging_mod._tile_for = lambda npad: args.tile
    if args.npad:
        imaging_mod._npad_for = lambda npixel, padding: args.npad

    rng = np.random.default_rng(7)
    scale = NPIX * CELL
    umax = 0.33 * NPIX / scale / 2
    u = jnp.asarray(rng.uniform(-umax, umax, NVIS).astype(np.float32))
    v = jnp.asarray(rng.uniform(-umax, umax, NVIS).astype(np.float32))
    w = jnp.asarray(rng.uniform(-50.0, 50.0, NVIS).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=NVIS).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=NVIS).astype(np.float32))
    wgt = jnp.ones(NVIS, dtype=jnp.float32)

    plan = make_imaging_plan(
        u, v, w, npixel=NPIX, cellsize=CELL, support=SUPPORT, nw=NW,
        do_wstacking=True, padding=1.25, chunk=args.chunk,
    )
    gp = plan.gp
    print(
        f"tile={gp.tile} chunk={gp.chunk} npad={gp.npixel} "
        f"nseg={gp.nseg} nslots={gp.nslots} prec={args.prec}",
        flush=True,
    )
    vals0 = jax.jit(jax.lax.complex)(vr, vi)
    vs = sort_values(gp, vals0)
    vs_r = jax.jit(jnp.real)(vs)
    vs_i = jax.jit(jnp.imag)(vs)

    from ska_sdp_func_python_tpu.config import gridder_precision

    prec = gridder_precision(args.prec)

    ts = gp.tile
    buf = ts + gp.support
    nta = gp.npixel // ts
    nseg = gp.nseg
    nrows = gp.geo.shape[0]
    nslots = gp.nslots
    npo = 2

    def slot_kernel_only(geo, vals_rows):
        grid_spec = gf.pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(nslots,),
            in_specs=[
                gf.pl.BlockSpec(
                    (nrows, gp.chunk),
                    lambda i, sg, sc, fi, st, ct: (0, sc[i]),
                    memory_space=gf.pltpu.VMEM,
                ),
                gf.pl.BlockSpec(
                    (8, gp.chunk),
                    lambda i, sg, sc, fi, st, ct: (0, sc[i] // 4),
                    memory_space=gf.pltpu.VMEM,
                ),
            ],
            out_specs=gf.pl.BlockSpec(
                (1, buf, 2 * npo * buf),
                lambda i, sg, sc, fi, st, ct: (sg[i], 0, 0),
                memory_space=gf.pltpu.VMEM,
            ),
        )
        kernel = partial(
            gf._grid_slot_kernel,
            buf=buf, support=gp.support, chunk=gp.chunk,
            ntiles=nta * nta, ntile_axis=nta, tile=ts, nplanes_out=npo,
            precision=prec, use_taps=nrows == 24, beta=gp.beta,
        )
        out = gf.pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (nseg, buf, 2 * npo * buf), jnp.float32
            ),
        )(gp.gs_seg, gp.gs_col, gp.gs_first, gp.starts, gp.counts,
          geo, vals_rows)
        return out

    npadv = gp.geo.shape[1] - gp.n
    pz = jnp.zeros((npadv,), jnp.float32)
    vals_rows = jax.jit(
        lambda a, b: gf._value_rows(
            jnp.concatenate([a, pz]), jnp.concatenate([b, pz]), gp.chunk
        )
    )(vs_r, vs_i)

    @jax.jit
    def run_kern(geo, vals_rows):
        acc = None
        for _ in range(K):
            o = slot_kernel_only(geo, vals_rows)
            eps = o[0, 0, 0] * jnp.float32(1e-30)
            vals_rows = vals_rows + eps
            acc = o[0, 0, 0] if acc is None else acc + o[0, 0, 0]
        return acc

    @jax.jit
    def run_kasm(gpp, vr_s, vi_s):
        vals = jax.lax.complex(vr_s, vi_s)
        acc = None
        for _ in range(K):
            g = grid_with_plan(gpp, vals, values_sorted=True,
                               precision=args.prec)
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
                plan, vals, wgt, values_sorted=True, precision=args.prec
            )
            eps = d[0, 0] * jnp.float32(1e-30)
            vals = vals + jax.lax.complex(eps, eps)
            acc = d if acc is None else acc + d
        return acc

    @jax.jit
    def noop(x):
        return x + 1.0

    def fetch(x):
        return float(np.asarray(jnp.real(x.ravel()[0] if x.ndim else x)))

    fetch(noop(jnp.float32(0.0)))
    overhead = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        fetch(noop(jnp.float32(0.0)))
        overhead = min(overhead, time.perf_counter() - t0)
    print(f"dispatch overhead {overhead*1e3:.1f} ms", flush=True)

    def best_of(name, fn, *fargs, reps=4):
        t0 = time.perf_counter()
        out = fn(*fargs)
        fetch(out)
        print(f"  {name} compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(fn(*fargs))
            times.append(time.perf_counter() - t0)
        best = (min(times) - overhead) / K
        print(f"{name}: {best*1e3:.2f} ms  (raw {[f'{t*1e3:.1f}' for t in times]})",
              flush=True)
        return best

    stages = args.stages.split(",")
    if "kern" in stages:
        best_of("slot kernel only", run_kern, gp.geo, vals_rows)
    if "kasm" in stages:
        best_of("kernel+assemble (grid_with_plan)", run_kasm, gp, vs_r, vs_i)
    if "full" in stages:
        best_of("full invert", run_full, plan, vs_r, vs_i, wgt)


if __name__ == "__main__":
    main()
