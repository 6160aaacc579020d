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
import numpy as np

_HAVE_PALLAS = True
try:  # pragma: no cover - environment probe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

__all__ = ["fused_grid_wstack", "fused_degrid_wstack", "fused_available"]

LANE = 128


def fused_available() -> bool:
    return _HAVE_PALLAS


def _seg_kernel(
    starts_ref,
    counts_ref,
    payload_hbm,
    out_ref,
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
    precision=None,
    depth: int = 2,
):
    """One program per (plane, tile) segment.

    payload_hbm: [8, N] f32 rows (u, v, frac, vr, vi, pads) sorted by
    segment.
    out_ref: [1, 2*nplanes_out*buf, buf] output tile accumulator with
    row blocks [re_lo; (re_hi;) im_lo(; im_hi)] — all four products come
    out of ONE [2*nplanes_out*buf, chunk] x [buf, chunk] MXU contraction
    (better MXU row-tile packing than four separate [buf, chunk] dots,
    and a single output-block write per program).
    scratch: [depth, 8, chunk] VMEM chunk ring; sems: DMA((depth,)).
    ``depth`` outstanding DMAs bound the stream-walk latency; measured
    performance is VPU-throughput-bound on the dense [buf, chunk]
    elementwise kernel evaluation, so depth 2 suffices.
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

    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(aligned + i * chunk, chunk)],
            scratch.at[slot],
            sems.at[slot],
        )

    # keep depth-1 DMAs in flight; the slot refilled at iteration i is the
    # one consumed at iteration i-1, so no in-flight slot is ever being read
    for d in range(depth - 1):
        @pl.when(d < nchunks)
        def _(d=d):
            get_dma(d, d).start()

    def es(offs):
        nu = offs / half
        nu2 = jnp.clip(nu * nu, 0.0, 1.0)
        k = jnp.exp(beta * (jnp.sqrt(1.0 - nu2) - 1.0))
        return jnp.where(jnp.abs(nu) < 1.0, k, 0.0)

    dn = (((1,), (1,)), ((), ()))  # contract chunk axis -> [rows, buf]

    def body(i, _):
        nxt = i + depth - 1

        @pl.when(nxt < nchunks)
        def _():
            get_dma(nxt % depth, nxt).start()

        slot = i % depth
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
        if nplanes_out == 1:
            lhs = jnp.concatenate([kv * vr, kv * vi], axis=0)
        else:
            w0 = 1.0 - frac
            w1 = frac
            lhs = jnp.concatenate(
                [
                    kv * (vr * w0),
                    kv * (vr * w1),
                    kv * (vi * w0),
                    kv * (vi * w1),
                ],
                axis=0,
            )
        out_ref[0, :, :] += jax.lax.dot_general(
            lhs, ku, dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=precision)
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
        "matmul_precision",
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
    matmul_precision: str | None = None,
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

    from .gridding_tiled import sorted_seg_bounds

    starts, counts = sorted_seg_bounds(seg_s, nseg)
    grids = _grid_execute(
        starts,
        counts,
        payload,
        npixel=npixel,
        support=support,
        nplanes=nplanes,
        nseg_planes=nseg_planes,
        nplanes_out=nplanes_out,
        wstacked=wstacked,
        tile=ts,
        chunk=chunk,
        interpret=interpret,
        precision=matmul_precision,
    )
    if squeeze:
        return grids[0]
    return grids


def _grid_execute(
    starts,
    counts,
    payload,
    *,
    npixel: int,
    support: int,
    nplanes: int,
    nseg_planes: int,
    nplanes_out: int,
    wstacked: bool,
    tile: int,
    chunk: int,
    interpret: bool,
    precision=None,
    depth: int = 8,
):
    """Pallas segment kernel + plane combine + overlap-add assemble over a
    prepared (sorted) payload stream. Shared by :func:`fused_grid_wstack`
    and the plan path (gridding_plan.py)."""
    ts = tile
    buf = ts + support
    ntile_axis = npixel // ts
    ntiles = ntile_axis * ntile_axis
    nseg = ntiles * nseg_planes

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nseg,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, 2 * nplanes_out * buf, buf),
            lambda s, starts, counts: (s, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((depth, 8, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
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
        precision=precision,
        depth=depth,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct(
            (nseg, 2 * nplanes_out * buf, buf), jnp.float32
        ),
    )(starts, counts, payload)

    if wstacked:
        # row blocks [re_lo; re_hi; im_lo; im_hi]; combine lower/upper
        # halves into per-plane tile stacks: plane p receives seg (p, :)
        # lower halves and seg (p-1, :) uppers
        o = out.reshape(nseg_planes, ntiles, 4, buf, buf)
        zt = jnp.zeros((1, ntiles, buf, buf), jnp.float32)
        acc_r = (
            jnp.concatenate([o[:, :, 0], zt], axis=0)
            + jnp.concatenate([zt, o[:, :, 1]], axis=0)
        )
        acc_i = (
            jnp.concatenate([o[:, :, 2], zt], axis=0)
            + jnp.concatenate([zt, o[:, :, 3]], axis=0)
        )
        acc = jax.lax.complex(acc_r, acc_i)  # [nplanes, ntiles, buf, buf]
        acc = acc.reshape(nplanes, ntile_axis, ntile_axis, buf, buf)
    else:
        acc = jax.lax.complex(out[:, :buf], out[:, buf:])
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

    return jax.vmap(assemble)(acc)


# ---------------------------------------------------------------------------
# fused degrid (predict): adjoint of the fused gridder
# ---------------------------------------------------------------------------


def _degrid_kernel(
    slot_seg_ref,
    slot_col_ref,
    seg_starts_ref,
    seg_counts_ref,
    payload_ref,
    tlo_r_ref,
    tlo_i_ref,
    thi_r_ref,
    thi_i_ref,
    out_r_ref,
    out_i_ref,
    out_idx_ref,
    *,
    buf: int,
    support: int,
    chunk: int,
    ntiles: int,
    ntile_axis: int,
    tile: int,
    nseg: int,
    sentinel: float,
    wstacked: bool,
    idx_row: int = 3,
    precision=None,
):
    """One program per chunk-aligned slot of the sorted entry stream.

    All inputs are block-spec'd (auto-pipelined): payload [8, chunk] chunk
    column, and the [1, buf, buf] lower/upper plane tiles selected by the
    prefetched slot->segment map. Outputs one [1, chunk] value row per slot
    plus the pass-through entry index (f32-bitcast) for the back-sort.
    """
    i = pl.program_id(0)
    seg = slot_seg_ref[i]  # in [0, nseg]; nseg = trash (out-of-grid)
    col = slot_col_ref[i]
    start = seg_starts_ref[seg]
    count = seg_counts_ref[seg]
    segc = jnp.minimum(seg, nseg - 1)
    t = segc % ntiles
    tv0 = jnp.float32(0) + (t // ntile_axis * tile)
    tu0 = jnp.float32(0) + (t % ntile_axis * tile)

    beta = 2.3 * support
    half = support / 2.0
    r = jax.lax.broadcasted_iota(jnp.int32, (buf, chunk), 0).astype(
        jnp.float32
    )
    gidx = col * chunk + jax.lax.broadcasted_iota(
        jnp.int32, (1, chunk), 1
    )
    valid = (gidx >= start) & (gidx < start + count)
    live = valid & (seg < nseg)

    data = payload_ref[...]
    uu = data[0][None, :]
    vv = data[1][None, :]
    frac = jnp.where(live, data[2][None, :], 0.0)
    idx_bits = jnp.where(valid, data[idx_row][None, :], sentinel)

    def es(offs):
        nu = offs / half
        nu2 = jnp.clip(nu * nu, 0.0, 1.0)
        k = jnp.exp(beta * (jnp.sqrt(1.0 - nu2) - 1.0))
        return jnp.where(jnp.abs(nu) < 1.0, k, 0.0)

    kv = es(tv0 + r - vv)  # [buf, chunk]
    ku = es(tu0 + r - uu)
    livef = jnp.where(live, 1.0, 0.0)

    # val[c] = sum_x ( sum_r T[r, x] kv[r, c] ) ku[x, c]
    dn = (((0,), (0,)), ((), ()))  # contract r -> [x, c]

    def tile_vals(t_ref):
        a = jax.lax.dot_general(
            t_ref[0], kv, dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=precision,
        )
        return jnp.sum(a * ku, axis=0, keepdims=True)  # [1, chunk]

    if wstacked:
        w0 = (1.0 - frac) * livef
        w1 = frac * livef
        out_r_ref[...] = tile_vals(tlo_r_ref) * w0 + tile_vals(thi_r_ref) * w1
        out_i_ref[...] = tile_vals(tlo_i_ref) * w0 + tile_vals(thi_i_ref) * w1
    else:
        out_r_ref[...] = tile_vals(tlo_r_ref) * livef
        out_i_ref[...] = tile_vals(tlo_i_ref) * livef
    out_idx_ref[...] = idx_bits


@partial(
    jax.jit,
    static_argnames=(
        "support",
        "nplanes",
        "tile",
        "chunk",
        "interpret",
        "matmul_precision",
    ),
)
def fused_degrid_wstack(
    u_pix,
    v_pix,
    grids,
    plane_idx=None,
    plane_frac=None,
    *,
    support: int = 8,
    nplanes: int = 1,
    tile: int = 64,
    chunk: int = 512,
    interpret: bool | None = None,
    matmul_precision: str | None = None,
):
    """Degrid visibilities from (optionally w-stacked) grids: the adjoint of
    :func:`fused_grid_wstack`, same contract as tiled_degrid.

    One N-entry sort by (w-plane, uv-tile) segment, one Pallas program per
    chunk slot (entries block-aligned within their segment), value =
    kv^T . T . ku with both plane weights applied in-kernel, and a single
    back-sort on the pass-through entry index restores the original order.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    u_pix = u_pix.astype(jnp.float32)
    v_pix = v_pix.astype(jnp.float32)
    if grids.ndim == 2:
        grids = grids[None]
    grids = grids.astype(jnp.complex64)
    npixel = grids.shape[-1]
    half = support // 2
    ts = tile
    buf = ts + support
    ntile_axis = npixel // ts
    if ntile_axis * ts != npixel:
        raise ValueError(f"tile {ts} must divide npixel {npixel}")
    ntiles = ntile_axis * ntile_axis
    wstacked = plane_idx is not None and plane_frac is not None and nplanes > 1
    nearest = plane_idx is not None and plane_frac is None and nplanes > 1
    if wstacked:
        nseg = ntiles * (nplanes - 1)
    elif nearest:
        nseg = ntiles * nplanes
    else:
        nseg = ntiles

    iu0 = jnp.floor(u_pix).astype(jnp.int32) - (half - 1)
    iv0 = jnp.floor(v_pix).astype(jnp.int32) - (half - 1)
    in_grid = (
        (iu0 >= 0)
        & (iu0 + support <= npixel)
        & (iv0 >= 0)
        & (iv0 + support <= npixel)
    )
    iu0c = jnp.clip(iu0, 0, npixel - support)
    iv0c = jnp.clip(iv0, 0, npixel - support)
    base = (iv0c // ts) * ntile_axis + (iu0c // ts)
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

    n = u_pix.shape[0]
    idx_bits = jax.lax.bitcast_convert_type(
        jnp.arange(n, dtype=jnp.int32), jnp.float32
    )
    seg_s, u_s, v_s, f_s, ib_s = jax.lax.sort(
        (seg, u_pix, v_pix, frac, idx_bits), num_keys=1
    )
    npad = (-n) % chunk + chunk
    pz = jnp.zeros((npad,), jnp.float32)  # pad entries are never valid
    u_s = jnp.concatenate([u_s, pz])
    v_s = jnp.concatenate([v_s, pz])
    f_s = jnp.concatenate([f_s, pz])
    ib_s = jnp.concatenate([ib_s, pz])
    z = jnp.zeros_like(u_s)
    payload = jnp.stack([u_s, v_s, f_s, ib_s, z, z, z, z])  # [8, Npad]

    # segment bounds INCLUDING the trash segment (out-of-grid entries must
    # still return their pass-through index for the back-sort)
    from .gridding_tiled import sorted_seg_bounds

    starts_p, counts_p = sorted_seg_bounds(seg_s, nseg + 1)
    nslots = n // chunk + nseg + 3
    ncols = payload.shape[1] // chunk
    slot_seg, slot_col = _degrid_slots(
        starts_p, counts_p, nslots=nslots, ncols=ncols, nseg=nseg,
        chunk=chunk,
    )
    vr_o, vi_o = _degrid_execute(
        slot_seg,
        slot_col,
        starts_p,
        counts_p,
        payload,
        grids,
        n=n,
        nslots=nslots,
        npixel=npixel,
        support=support,
        nplanes=nplanes,
        nseg=nseg,
        wstacked=wstacked,
        tile=ts,
        chunk=chunk,
        interpret=interpret,
        precision=matmul_precision,
    )
    return jax.lax.complex(vr_o, vi_o)


def _degrid_slots(starts_p, counts_p, *, nslots, ncols, nseg, chunk):
    """Map each chunk-aligned Pallas slot to its (segment, payload column).

    Each segment owns the chunk columns spanning its slice of the sorted
    stream; entries in a shared boundary column appear in two slots and are
    masked to exactly one by the kernel's [start, start+count) check."""
    acol = starts_p // chunk
    ecol = (starts_p + counts_p + chunk - 1) // chunk
    slot_counts = jnp.maximum(ecol - acol, 0)
    slot_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(slot_counts).astype(jnp.int32)]
    )
    sidx = jnp.arange(nslots, dtype=jnp.int32)
    slot_seg = (
        jnp.searchsorted(slot_offsets, sidx, side="right") - 1
    ).astype(jnp.int32)
    slot_seg_c = jnp.clip(slot_seg, 0, nseg)
    slot_col = acol[slot_seg_c] + (sidx - slot_offsets[slot_seg_c])
    slot_valid = sidx < slot_offsets[-1]
    # unused slots point at the all-pad final column (beyond every
    # segment's range), so they emit only sentinels
    slot_col = jnp.where(
        slot_valid, jnp.clip(slot_col, 0, ncols - 1), ncols - 1
    )
    slot_seg = jnp.where(slot_valid, slot_seg_c, nseg)
    return slot_seg, slot_col


def _degrid_execute(
    slot_seg,
    slot_col,
    starts_p,
    counts_p,
    payload,
    grids,
    *,
    n: int,
    nslots: int,
    npixel: int,
    support: int,
    nplanes: int,
    nseg: int,
    wstacked: bool,
    tile: int,
    chunk: int,
    interpret: bool,
    idx_row: int = 3,
    precision=None,
):
    """Pallas degrid kernel + back-sort over prepared slot maps. Shared by
    :func:`fused_degrid_wstack` and the plan path (gridding_plan.py).
    Returns (vr, vi) [n] in the order given by the payload's idx_row."""
    ts = tile
    buf = ts + support
    ntile_axis = npixel // ts
    ntiles = ntile_axis * ntile_axis

    tiles = jax.vmap(lambda g: _extract_tiles_f(g, ts, support))(grids)
    tiles = tiles.reshape(nplanes * ntiles, buf, buf)
    tiles_r = jnp.real(tiles)
    tiles_i = jnp.imag(tiles)

    # back-sort key for masked lanes: the f32 bit pattern of int32(n),
    # which sorts after every real entry index
    sentinel_bits = float(np.asarray(n, np.int32).view(np.float32))

    def lo_map(i, ss, sc, st, ct):
        return (jnp.minimum(ss[i], nseg - 1), 0, 0)

    def hi_map(i, ss, sc, st, ct):
        return (jnp.minimum(ss[i], nseg - 1) + (ntiles if wstacked else 0),
                0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nslots,),
        in_specs=[
            pl.BlockSpec(
                (8, chunk), lambda i, ss, sc, st, ct: (0, sc[i]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, buf, buf), lo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, buf, buf), lo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, buf, buf), hi_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, buf, buf), hi_map, memory_space=pltpu.VMEM),
        ],
        # [1, nslots*chunk] row layout: Mosaic requires the block's
        # second-to-last dim be 8-divisible or equal the array dim
        out_specs=(
            pl.BlockSpec(
                (1, chunk), lambda i, ss, sc, st, ct: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, chunk), lambda i, ss, sc, st, ct: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, chunk), lambda i, ss, sc, st, ct: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ),
    )
    kernel = partial(
        _degrid_kernel,
        buf=buf,
        support=support,
        chunk=chunk,
        ntiles=ntiles,
        ntile_axis=ntile_axis,
        tile=ts,
        nseg=nseg,
        sentinel=sentinel_bits,
        wstacked=wstacked,
        idx_row=idx_row,
        precision=precision,
    )
    out_r, out_i, out_ib = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=(
            jax.ShapeDtypeStruct((1, nslots * chunk), jnp.float32),
            jax.ShapeDtypeStruct((1, nslots * chunk), jnp.float32),
            jax.ShapeDtypeStruct((1, nslots * chunk), jnp.float32),
        ),
    )(slot_seg, slot_col, starts_p, counts_p, payload, tiles_r, tiles_i,
      tiles_r, tiles_i)

    key = jax.lax.bitcast_convert_type(out_ib.reshape(-1), jnp.int32)
    _, vr_o, vi_o = jax.lax.sort(
        (key, out_r.reshape(-1), out_i.reshape(-1)), num_keys=1
    )
    return vr_o[:n], vi_o[:n]


def _extract_tiles_f(grid, ts: int, support: int):
    """All (ts+S)^2 overlapping tiles of an [n, n] grid as
    [ntv*ntu, buf, buf] via reshapes + rolls (no gather)."""
    n = grid.shape[-1]
    ntv = n // ts
    buf = ts + support

    def blocks(g):
        return g.reshape(ntv, ts, ntv, ts).transpose(0, 2, 1, 3)

    a = blocks(grid)
    b = blocks(jnp.roll(grid, -ts, axis=1))[..., :, :support]
    c = blocks(jnp.roll(grid, -ts, axis=0))[..., :support, :]
    d = blocks(jnp.roll(jnp.roll(grid, -ts, axis=0), -ts, axis=1))[
        ..., :support, :support
    ]
    top = jnp.concatenate([a, b], axis=-1)
    bottom = jnp.concatenate([c, d], axis=-1)
    out = jnp.concatenate([top, bottom], axis=-2)
    return out.reshape(ntv * ntv, buf, buf)
