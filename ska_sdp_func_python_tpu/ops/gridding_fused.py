"""Fused Pallas w-stack gridder: sort once, grid all planes in one kernel.

Second-generation TPU gridding fast path (supersedes the XLA unit pipeline
in ops/gridding_tiled.py for the invert hot loop; reference contract:
/root/reference/src/ska_sdp_func_python/grid_data/gridding.py:160-255 and
the ducc0 w-stacking wrapper imaging/ng.py:146-293).

Measured bottlenecks of the XLA tiled path at the 10M-vis BASELINE config
(bench_stages.py): the 2N-entry payload sort, the unit-layout gathers, and
the [U, buf, buf] cumsum segmented reduction dominate; the MXU matmuls and
FFTs are cheap. This module removes all three:

1.  **Half the sort.** Each visibility is sorted ONCE, keyed by
    (lower w-plane, v-tile, u-tile) segment id. The linear w-interpolation
    weights (1-frac, frac) are applied *inside* the kernel, so the entry
    stream is N long, not 2N, and the separable ES kernel factors kv/ku are
    shared between the two neighbouring planes.
2.  **No unit gathers.** The kernel walks each segment's contiguous slice
    of the sorted stream with double-buffered, 128-lane-aligned DMAs
    (masking the ragged edges), so the stream is read exactly once,
    sequentially.
3.  **No cumsum reduction.** Each Pallas program owns one (plane, tile)
    segment and accumulates its chunks into a VMEM accumulator; every
    output tile is written to HBM exactly once. The [U, buf, buf]
    intermediate and its prefix sum disappear entirely.

Payload layout: one [8, N] f32 array (u, v, frac, vr, vi, 3x pad) so
each chunk is a single DMA; padding to 8 rows satisfies the TPU sublane
tiling (DMA slices along the sublane dim must be 8-aligned).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_HAVE_PALLAS = True
try:  # pragma: no cover - environment probe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

__all__ = ["fused_grid_wstack", "fused_available"]

LANE = 128


def fused_available() -> bool:
    return _HAVE_PALLAS


def _seg_kernel(
    starts_ref,
    counts_ref,
    payload_hbm,
    tr_ref,
    ti_ref,
    scratch,
    sems,
    *,
    buf: int,
    support: int,
    chunk: int,
    ntiles: int,
    ntile_axis: int,
    tile: int,
    nplanes_out: int,
):
    """One program per (plane, tile) segment.

    payload_hbm: [8, N] f32 rows (u, v, frac, vr, vi, pads) sorted by
    segment.
    tr_ref/ti_ref: [1, nplanes_out*buf, buf] output tile accumulators
    (plane-major rows) for the lower/upper w-plane halves.
    scratch: [2, 8, chunk] double-buffered VMEM chunks; sems: DMA((2,)).
    """
    seg = pl.program_id(0)
    start = starts_ref[seg]
    count = counts_ref[seg]
    t = seg % ntiles
    tv0 = jnp.float32(0) + (t // ntile_axis * tile)
    tu0 = jnp.float32(0) + (t % ntile_axis * tile)

    aligned = (start // LANE) * LANE
    off = start - aligned
    nchunks = (off + count + chunk - 1) // chunk

    beta = 2.3 * support
    half = support / 2.0
    r = jax.lax.broadcasted_iota(jnp.int32, (buf, chunk), 0).astype(
        jnp.float32
    )
    cix = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    tr_ref[...] = jnp.zeros(tr_ref.shape, tr_ref.dtype)
    ti_ref[...] = jnp.zeros(ti_ref.shape, ti_ref.dtype)

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(aligned + i * chunk, chunk)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def es(offs):
        nu = offs / half
        nu2 = jnp.clip(nu * nu, 0.0, 1.0)
        k = jnp.exp(beta * (jnp.sqrt(1.0 - nu2) - 1.0))
        return jnp.where(jnp.abs(nu) < 1.0, k, 0.0)

    dn = (((1,), (1,)), ((), ()))  # contract chunk axis -> [buf, buf]

    def body(i, _):
        slot = i % 2

        @pl.when(i + 1 < nchunks)
        def _():
            get_dma(1 - slot, i + 1).start()

        get_dma(slot, i).wait()
        data = scratch[slot]  # [8, chunk]
        gidx = aligned + i * chunk + cix  # [1, chunk]
        valid = (gidx >= start) & (gidx < start + count)
        uu = data[0][None, :]
        vv = data[1][None, :]
        frac = jnp.where(valid, data[2][None, :], 0.0)
        vr = jnp.where(valid, data[3][None, :], 0.0)
        vi = jnp.where(valid, data[4][None, :], 0.0)
        kv = es(tv0 + r - vv)  # [buf, chunk]
        ku = es(tu0 + r - uu)
        w0 = 1.0 - frac
        w1 = frac
        if nplanes_out == 1:
            tr_ref[0, :, :] += jax.lax.dot_general(
                kv * vr, ku, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            ti_ref[0, :, :] += jax.lax.dot_general(
                kv * vi, ku, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        else:
            tr_ref[0, :buf, :] += jax.lax.dot_general(
                kv * (vr * w0), ku, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            tr_ref[0, buf:, :] += jax.lax.dot_general(
                kv * (vr * w1), ku, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            ti_ref[0, :buf, :] += jax.lax.dot_general(
                kv * (vi * w0), ku, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            ti_ref[0, buf:, :] += jax.lax.dot_general(
                kv * (vi * w1), ku, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)


@partial(
    jax.jit,
    static_argnames=(
        "npixel",
        "support",
        "nplanes",
        "tile",
        "chunk",
        "interpret",
    ),
)
def fused_grid_wstack(
    u_pix,
    v_pix,
    vals,
    plane_idx=None,
    plane_frac=None,
    *,
    npixel: int,
    support: int = 8,
    nplanes: int = 1,
    tile: int = 64,
    chunk: int = 512,
    interpret: bool | None = None,
):
    """Grid (optionally w-stacked) visibilities with the fused Pallas path.

    Same contract as ops/gridding_tiled.tiled_grid: u_pix/v_pix [N]
    fractional grid coords, vals [N] complex weighted visibilities,
    plane_idx [N] lower w-plane (int32, in [0, nplanes-2]) and plane_frac
    [N] the linear fraction to the upper plane. Returns
    [nplanes, npixel, npixel] complex grids ([npixel, npixel] when
    nplanes == 1 and plane_idx is None).
    """
    if interpret is None:
        # interpret mode on non-TPU backends (CPU tests)
        interpret = jax.default_backend() == "cpu"
    # the kernel is f32/c64 by design (TPU-native path)
    u_pix = u_pix.astype(jnp.float32)
    v_pix = v_pix.astype(jnp.float32)
    vals = vals.astype(jnp.complex64)
    squeeze = nplanes == 1 and plane_idx is None
    half = support // 2
    ts = tile
    buf = ts + support
    ntile_axis = -(-npixel // ts)
    if ntile_axis * ts != npixel:
        raise ValueError(f"tile {ts} must divide npixel {npixel}")
    ntiles = ntile_axis * ntile_axis
    wstacked = plane_idx is not None and plane_frac is not None and nplanes > 1
    nearest = plane_idx is not None and plane_frac is None and nplanes > 1
    if wstacked:
        nseg_planes = nplanes - 1
        nplanes_out = 2
    elif nearest:
        nseg_planes = nplanes
        nplanes_out = 1
    else:
        nseg_planes = 1
        nplanes_out = 1
    nseg = ntiles * nseg_planes

    iu0 = jnp.floor(u_pix).astype(jnp.int32) - (half - 1)
    iv0 = jnp.floor(v_pix).astype(jnp.int32) - (half - 1)
    in_grid = (
        (iu0 >= 0)
        & (iu0 + support <= npixel)
        & (iv0 >= 0)
        & (iv0 + support <= npixel)
    )
    vals = jnp.where(in_grid, vals, 0.0)
    iu0c = jnp.clip(iu0, 0, npixel - support)
    iv0c = jnp.clip(iv0, 0, npixel - support)
    tu = iu0c // ts
    tv = iv0c // ts
    base = tv * ntile_axis + tu

    if wstacked:
        p0 = jnp.clip(plane_idx, 0, nplanes - 2)
        frac = plane_frac.astype(jnp.float32)
        seg = (p0 * ntiles + base).astype(jnp.int32)
    elif nearest:
        p0 = jnp.clip(plane_idx, 0, nplanes - 1)
        frac = jnp.zeros_like(u_pix)
        seg = (p0 * ntiles + base).astype(jnp.int32)
    else:
        frac = jnp.zeros_like(u_pix)
        seg = base.astype(jnp.int32)
    seg = jnp.where(in_grid, seg, jnp.asarray(nseg, jnp.int32))

    seg_s, u_s, v_s, f_s, vr_s, vi_s = jax.lax.sort(
        (seg, u_pix, v_pix, frac, jnp.real(vals), jnp.imag(vals)),
        num_keys=1,
    )
    n = u_s.shape[0]
    # the last segment's chunk window may overrun the stream tail by up to
    # one chunk: pad so every DMA stays in bounds
    npad = (-n) % LANE + chunk
    if npad:
        pz = jnp.zeros((npad,), jnp.float32)
        u_s = jnp.concatenate([u_s, pz])
        v_s = jnp.concatenate([v_s, pz])
        f_s = jnp.concatenate([f_s, pz])
        vr_s = jnp.concatenate([vr_s, pz])
        vi_s = jnp.concatenate([vi_s, pz])
    z = jnp.zeros_like(u_s)
    payload = jnp.stack(
        [u_s, v_s, f_s, vr_s, vi_s, z, z, z]
    )  # [8, Npad]: sublane dim padded to the (8, 128) f32 tile

    counts = jnp.bincount(seg_s, length=nseg + 1)[:nseg].astype(jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nseg,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec(
                (1, nplanes_out * buf, buf),
                lambda s, starts, counts: (s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nplanes_out * buf, buf),
                lambda s, starts, counts: (s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = partial(
        _seg_kernel,
        buf=buf,
        support=support,
        chunk=chunk,
        ntiles=ntiles,
        ntile_axis=ntile_axis,
        tile=ts,
        nplanes_out=nplanes_out,
    )
    tr, ti = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=(
            jax.ShapeDtypeStruct((nseg, nplanes_out * buf, buf), jnp.float32),
            jax.ShapeDtypeStruct((nseg, nplanes_out * buf, buf), jnp.float32),
        ),
    )(starts, counts, payload)

    if wstacked:
        # combine the lower/upper halves into per-plane tile stacks:
        # plane p receives seg (p, :) lower halves and seg (p-1, :) uppers
        tr = tr.reshape(nseg_planes, ntiles, 2, buf, buf)
        ti = ti.reshape(nseg_planes, ntiles, 2, buf, buf)
        zt = jnp.zeros((1, ntiles, buf, buf), jnp.float32)
        acc_r = (
            jnp.concatenate([tr[:, :, 0], zt], axis=0)
            + jnp.concatenate([zt, tr[:, :, 1]], axis=0)
        )
        acc_i = (
            jnp.concatenate([ti[:, :, 0], zt], axis=0)
            + jnp.concatenate([zt, ti[:, :, 1]], axis=0)
        )
        acc = jax.lax.complex(acc_r, acc_i)  # [nplanes, ntiles, buf, buf]
        acc = acc.reshape(nplanes, ntile_axis, ntile_axis, buf, buf)
    else:
        acc = jax.lax.complex(tr[:, :buf], ti[:, :buf])
        acc = acc.reshape(nseg_planes, ntile_axis, ntile_axis, buf, buf)

    def assemble(tiles):
        a = tiles[:, :, :ts, :ts]
        b = jnp.pad(
            tiles[:, :, :ts, ts:], ((0, 0), (0, 0), (0, 0), (0, ts - support))
        )
        c = jnp.pad(
            tiles[:, :, ts:, :ts], ((0, 0), (0, 0), (0, ts - support), (0, 0))
        )
        d = jnp.pad(
            tiles[:, :, ts:, ts:],
            ((0, 0), (0, 0), (0, ts - support), (0, ts - support)),
        )

        def flatten(x):
            return x.transpose(0, 2, 1, 3).reshape(npixel, npixel)

        grid = flatten(a)
        grid = grid + jnp.roll(flatten(b), ts, axis=1)
        grid = grid + jnp.roll(flatten(c), ts, axis=0)
        grid = grid + jnp.roll(jnp.roll(flatten(d), ts, axis=0), ts, axis=1)
        return grid

    grids = jax.vmap(assemble)(acc)
    if squeeze:
        return grids[0]
    return grids
