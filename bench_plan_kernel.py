"""Fine-grained breakdown of grid_with_plan on a real plan:
  prep   = value rows prep (real/imag + stack + pad)
  kern   = pallas slot kernel only (prebuilt vals rows)
  kasm   = kernel + pallas assemble + complex
Run: python bench_plan_kernel.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from ska_sdp_func_python_tpu.ops.imaging import make_imaging_plan
from ska_sdp_func_python_tpu.ops.gridding_plan import sort_values
from ska_sdp_func_python_tpu.ops import gridding_fused as gf

NVIS = int(10e6)
NPIX = 1024
CELL = 5e-5
NW = 8
SUPPORT = 8


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0].ravel()[0]
    return float(np.asarray(jnp.real(leaf)))


def timeit(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    fetch(out)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: best {best*1e3:.1f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(7)
    scale = NPIX * CELL
    umax = 0.33 * NPIX / scale / 2
    u = jnp.asarray(rng.uniform(-umax, umax, NVIS).astype(np.float32))
    v = jnp.asarray(rng.uniform(-umax, umax, NVIS).astype(np.float32))
    w = jnp.asarray(rng.uniform(-50.0, 50.0, NVIS).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=NVIS).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=NVIS).astype(np.float32))
    vals = jax.jit(jax.lax.complex)(vr, vi)

    plan = make_imaging_plan(
        u, v, w, npixel=NPIX, cellsize=CELL, support=SUPPORT, nw=NW,
        do_wstacking=True,
    )
    gp = plan.gp
    fetch(gp.rank)
    print("plan built", flush=True)
    vs = sort_values(gp, vals)
    fetch(vs)

    @jax.jit
    def prep(vs):
        vr_s = jnp.real(vs).astype(jnp.float32)
        vi_s = jnp.imag(vs).astype(jnp.float32)
        npad = gp.geo.shape[1] - gp.n
        return jnp.pad(jnp.stack([vr_s, vi_s]), ((0, 0), (0, npad)))

    vals_rows = timeit("prep", prep, vs)

    common = dict(
        npixel=gp.npixel, support=gp.support, nplanes=gp.nplanes,
        nseg_planes=gp.nplanes - 1, nplanes_out=2, wstacked=True,
        tile=gp.tile, chunk=gp.chunk, interpret=False,
    )

    ts = gp.tile
    buf = ts + gp.support
    nta = gp.npixel // ts
    nseg = nta * nta * (gp.nplanes - 1)
    nrows = gp.geo.shape[0]
    nslots = gp.gs_seg.shape[0]

    @jax.jit
    def kern(geo, vals_rows, gs_seg, gs_col, gs_first, starts, counts):
        grid_spec = gf.pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(nslots,),
            in_specs=[
                gf.pl.BlockSpec((nrows, gp.chunk),
                                lambda i, sg, sc, fi, st, ct: (0, sc[i]),
                                memory_space=gf.pltpu.VMEM),
                gf.pl.BlockSpec((2, gp.chunk),
                                lambda i, sg, sc, fi, st, ct: (0, sc[i]),
                                memory_space=gf.pltpu.VMEM),
            ],
            out_specs=gf.pl.BlockSpec(
                (1, 4 * buf, buf),
                lambda i, sg, sc, fi, st, ct: (sg[i], 0, 0),
                memory_space=gf.pltpu.VMEM),
        )
        kernel = partial(
            gf._grid_slot_kernel, buf=buf, support=gp.support,
            chunk=gp.chunk, ntiles=nta * nta, ntile_axis=nta, tile=ts,
            nplanes_out=2, precision=None, use_taps=nrows == 24,
        )
        out = gf.pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nseg, 4 * buf, buf),
                                           jnp.float32),
        )(gs_seg, gs_col, gs_first, starts, counts, geo, vals_rows)
        return jnp.sum(out[::97, 0])

    timeit("kern", kern, gp.geo, vals_rows, gp.gs_seg, gp.gs_col,
           gp.gs_first, gp.starts, gp.counts)

    @jax.jit
    def kasm(geo, vals_rows, gs_seg, gs_col, gs_first, starts, counts):
        grids = gf._grid_execute(
            starts, counts, gs_seg, gs_col, gs_first, geo, vals_rows,
            **common)
        return jnp.sum(jnp.real(grids[:, ::33]))

    timeit("kasm", kasm, gp.geo, vals_rows, gp.gs_seg, gp.gs_col,
           gp.gs_first, gp.starts, gp.counts)


if __name__ == "__main__":
    main()
