"""Variant sweep of the fused grid stage at the BASELINE config.

Preps the sorted stream ONCE (payload padded to a multiple of 2048 so the
same stream serves chunk 512/1024/2048), then times _grid_execute variants:
chunk size x matmul precision, plus a kernel-only mode (no assemble) to
split the Pallas slot kernel from the overlap-add.

Run: python bench_grid_variants.py [variant ...]
Variants: c512 c1024 c2048 c1024-high c1024-def k512 k1024 (default: all)
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from ska_sdp_func_python_tpu.ops.gridding_fused import (
    _grid_execute,
    _grid_slots,
    _payload_stack,
    _value_rows,
)
from ska_sdp_func_python_tpu.ops.gridding_tiled import sorted_seg_bounds
from ska_sdp_func_python_tpu.ops.imaging import _w_planes

import os

NVIS = int(10e6)
NPIX = 1024
CELL = 5e-5
NW = 8
SUPPORT = 8
PAD = 2
NPAD = PAD * NPIX
TS = int(os.environ.get("TS", "64"))
CHUNK_MAX = 2048


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0].ravel()[0]
    return float(np.asarray(jnp.real(leaf)))


@partial(jax.jit, static_argnames=())
def prep(u, v, w, vr, vi):
    scale = NPAD * CELL
    u_pix = (-u * scale + NPAD // 2).astype(jnp.float32)
    v_pix = (v * scale + NPAD // 2).astype(jnp.float32)
    p0, frac, plane_w = _w_planes(w, NW, "linear")
    half = SUPPORT // 2
    nta = NPAD // TS
    ntiles = nta * nta
    nseg = ntiles * (NW - 1)
    iu0 = jnp.floor(u_pix).astype(jnp.int32) - (half - 1)
    iv0 = jnp.floor(v_pix).astype(jnp.int32) - (half - 1)
    in_grid = (
        (iu0 >= 0)
        & (iu0 + SUPPORT <= NPAD)
        & (iv0 >= 0)
        & (iv0 + SUPPORT <= NPAD)
    )
    vals = jnp.where(in_grid, jax.lax.complex(vr, vi), 0.0)
    iu0c = jnp.clip(iu0, 0, NPAD - SUPPORT)
    iv0c = jnp.clip(iv0, 0, NPAD - SUPPORT)
    base = (iv0c // TS) * nta + (iu0c // TS)
    p0c = jnp.clip(p0, 0, NW - 2)
    seg = (p0c * ntiles + base).astype(jnp.int32)
    seg = jnp.where(in_grid, seg, jnp.asarray(nseg, jnp.int32))
    seg_s, u_s, v_s, f_s, vr_s, vi_s = jax.lax.sort(
        (seg, u_pix, v_pix, frac, jnp.real(vals), jnp.imag(vals)),
        num_keys=1,
    )
    n = u_s.shape[0]
    npad = (-n) % CHUNK_MAX + CHUNK_MAX
    pz = jnp.zeros((npad,), jnp.float32)
    u_s = jnp.concatenate([u_s, pz])
    v_s = jnp.concatenate([v_s, pz])
    f_s = jnp.concatenate([f_s, pz])
    vr_s = jnp.concatenate([vr_s, pz])
    vi_s = jnp.concatenate([vi_s, pz])
    vals_rows = _value_rows(vr_s, vi_s, 512)
    z = jnp.zeros_like(u_s)
    payload = _payload_stack(
        u_s, v_s, f_s, z, z, npixel=NPAD, support=SUPPORT, tile=TS
    )
    starts, counts = sorted_seg_bounds(seg_s, nseg)
    return payload, vals_rows, starts, counts


@partial(jax.jit, static_argnames=("chunk", "ncols"))
def slots_for(starts, counts, *, chunk, ncols):
    nta = NPAD // TS
    nseg = nta * nta * (NW - 1)
    nslots = NVIS // chunk + nseg + 3
    return _grid_slots(
        starts, counts, nslots=nslots, ncols=ncols, nseg=nseg, chunk=chunk
    )


@partial(
    jax.jit,
    static_argnames=("chunk", "kernel_only", "precision"),
)
def run_grid(
    starts, counts, gs_seg, gs_col, gs_first, payload, vals_rows,
    *, chunk, kernel_only, precision,
):
    kw = dict(
        npixel=NPAD,
        support=SUPPORT,
        nplanes=NW,
        nseg_planes=NW - 1,
        nplanes_out=2,
        wstacked=True,
        tile=TS,
        chunk=chunk,
        interpret=False,
        precision=precision,
    )
    if kernel_only:
        # replicate _grid_execute up to the pallas_call, skip assemble
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from ska_sdp_func_python_tpu.ops.gridding_fused import (
            _grid_slot_kernel,
        )

        ts = TS
        buf = ts + SUPPORT
        nta = NPAD // ts
        ntiles = nta * nta
        nseg = ntiles * (NW - 1)
        nrows = payload.shape[0]
        nslots = gs_seg.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(nslots,),
            in_specs=[
                pl.BlockSpec(
                    (nrows, chunk),
                    lambda i, sg, sc, fi, st, ct: (0, sc[i]),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (8, chunk),
                    lambda i, sg, sc, fi, st, ct: (0, sc[i] // 4),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 4 * buf, buf),
                lambda i, sg, sc, fi, st, ct: (sg[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        kernel = partial(
            _grid_slot_kernel,
            buf=buf,
            support=SUPPORT,
            chunk=chunk,
            ntiles=ntiles,
            ntile_axis=nta,
            tile=ts,
            nplanes_out=2,
            precision=precision,
            use_taps=nrows == 24,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            interpret=False,
            out_shape=jax.ShapeDtypeStruct(
                (nseg, 4 * buf, buf), jnp.float32
            ),
        )(gs_seg, gs_col, gs_first, starts, counts, payload, vals_rows)
        return jnp.sum(out[0, 0]) , out[0, 0, 0]
    grids = _grid_execute(
        starts, counts, gs_seg, gs_col, gs_first, payload, vals_rows, **kw
    )
    return jnp.sum(jnp.abs(jnp.real(grids[0, :8, :8]))), grids


def main():
    which = sys.argv[1:] or [
        "c512", "k512", "c1024", "k1024", "c2048", "c1024-high",
        "c1024-def",
    ]
    rng = np.random.default_rng(7)
    scale = NPIX * CELL
    umax = 0.33 * NPIX / scale / 2
    u = jnp.asarray(rng.uniform(-umax, umax, NVIS).astype(np.float32))
    v = jnp.asarray(rng.uniform(-umax, umax, NVIS).astype(np.float32))
    w = jnp.asarray(rng.uniform(-50.0, 50.0, NVIS).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=NVIS).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=NVIS).astype(np.float32))

    t0 = time.perf_counter()
    payload, vals_rows, starts, counts = prep(u, v, w, vr, vi)
    fetch(starts)
    print(f"prep: {time.perf_counter()-t0:.1f}s", flush=True)

    ncols_total = payload.shape[1]
    slot_cache = {}
    base_grids = None

    for name in which:
        kernel_only = name.startswith("k")
        chunk = int(name.strip("ck").split("-")[0])
        if name.endswith("-def"):
            prec = "default"
        elif name.endswith("-b3"):
            prec = "bf16x3"
        else:
            prec = "highest"
        if chunk not in slot_cache:
            s = slots_for(
                starts, counts, chunk=chunk, ncols=ncols_total // chunk
            )
            fetch(s[0])
            slot_cache[chunk] = s
        gs_seg, gs_col, gs_first = slot_cache[chunk]
        t0 = time.perf_counter()
        chk, out = run_grid(
            starts, counts, gs_seg, gs_col, gs_first, payload, vals_rows,
            chunk=chunk, kernel_only=kernel_only, precision=prec,
        )
        fetch(chk)
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            chk, out = run_grid(
                starts, counts, gs_seg, gs_col, gs_first, payload,
                vals_rows, chunk=chunk, kernel_only=kernel_only,
                precision=prec,
            )
            fetch(chk)
            best = min(best, time.perf_counter() - t0)
        print(
            f"{name}: best {best*1e3:.1f} ms ({NVIS/best/1e6:.1f} Mvis/s"
            f" incl ~27ms dispatch)",
            flush=True,
        )
        if not kernel_only:
            if name == "c512":
                base_grids = out
            elif base_grids is not None:
                d = float(
                    np.asarray(
                        jnp.max(jnp.abs(out - base_grids))
                        / jnp.max(jnp.abs(base_grids))
                    )
                )
                print(f"{name}: max rel diff vs c512-highest: {d:.3e}",
                      flush=True)


if __name__ == "__main__":
    main()
