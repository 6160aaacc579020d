"""Tiled-matmul gridding: the TPU fast path (framework L2, C7 hot kernel).

XLA's scatter-add serialises the reference-style gridding update
(gridding.py:238-246 equivalent): ~N*S^2 individual accumulations run at
<0.1 Mvis/s on TPU. This module reformulates gridding so the hot loop is
dense MXU matmuls with NO scatter at all:

1.  sort visibilities by uv tile (argsort of tile ids; XLA sort);
2.  cut the sorted stream into fixed-size *units* of C visibilities, each
    unit belonging to exactly one (w-plane, v-strip, u-block) tile —
    padding is bounded by one unit per non-empty tile;
3.  for each unit, evaluate the separable ES kernel *densely* over the
    tile's (TS+S) rows/columns (kernel values vanish outside the support,
    so no placement logic is needed) and form the tile contribution as a
    batched matmul:  tile += rowmat^T @ colmat   [TS+S, C] x [C, TS+S];
4.  reduce units onto tiles with a one-hot matmul (again MXU, no scatter);
5.  overlap-add the tile array into the grid with four reshape+roll moves
    (halos are provably zero at the grid edge because out-of-grid
    visibilities are weight-masked).

The same machinery grids all w-planes in one pass: each visibility is
duplicated onto its two neighbouring planes with linear weights and the
plane index becomes part of the tile id.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .gridding import es_kernel

__all__ = ["tiled_grid", "tiled_degrid"]


def sorted_seg_bounds(seg_s, nbins: int):
    """(starts, counts) of each bin in an already-sorted key array.

    Replaces ``bincount`` + ``cumsum``: a 10M-entry bincount is a
    scatter-add (~100 ms on one v5e); binary search over the sorted keys
    is ~1 ms for thousands of bins.
    """
    edges = jnp.searchsorted(
        seg_s, jnp.arange(nbins + 1, dtype=seg_s.dtype), side="left"
    ).astype(jnp.int32)
    return edges[:-1], edges[1:] - edges[:-1]


def _dense_kernel(tile0, pix, length: int, support: int, beta=None):
    """Kernel values over ``length`` consecutive cells starting at tile0.

    k[u, c, r] = es((tile0_u + r - pix_uc) / (support/2)); zero outside
    the support. tile0: [UB]; pix: [UB, C] -> [UB, C, length].
    """
    half = support // 2
    r = jnp.arange(length, dtype=pix.dtype)
    # difference first: (tile0 + r) - pix would round the intermediate
    # at eps32 * npixel (the round-5 on-chip 1.6e-5 finding)
    offs = (tile0[:, None, None] - pix[:, :, None]) + r[None, None, :]
    return es_kernel(offs / half, support, beta)


@partial(
    jax.jit,
    static_argnames=(
        "npixel",
        "support",
        "nplanes",
        "tile",
        "unit",
        "beta",
        "w_order",
        "w_beta",
    ),
)
def tiled_grid(
    u_pix,
    v_pix,
    vals,
    plane_idx=None,
    plane_frac=None,
    u_lo=None,
    v_lo=None,
    *,
    npixel: int,
    support: int = 8,
    nplanes: int = 1,
    tile: int = 56,
    unit: int = 1024,
    beta: float | None = None,
    w_order: int = 1,
    w_beta: float | None = None,
):
    """Grid (optionally w-stacked) visibilities onto [nplanes, npixel,
    npixel] without scatter.

    :param u_pix, v_pix: [N] fractional grid coords
    :param vals: [N] complex weighted visibilities
    :param plane_idx: [N] int32 lower w-plane per vis (or None)
    :param plane_frac: [N] fraction to the upper plane (or None)
    :return: grids [nplanes, npixel, npixel] complex (squeezed to
        [npixel, npixel] when nplanes == 1 and plane_idx is None)
    """
    squeeze = nplanes == 1 and plane_idx is None
    if w_order == 2 and plane_idx is not None and nplanes < 3:
        # the 3-plane Lagrange stencil clips the centre plane to
        # [1, nplanes-2]; with nplanes < 3 the dj=+1 entries would fall
        # past the segment table and silently drop flux
        raise ValueError(
            f"w_order=2 needs nplanes >= 3, got {nplanes}"
        )
    if w_order >= 4 and plane_idx is not None and nplanes < w_order + 1:
        raise ValueError(
            f"w_order={w_order} (ES w-kernel) needs nplanes >= "
            f"{w_order + 1}, got {nplanes}"
        )
    half = support // 2
    ts = tile
    buf = ts + support
    ntile_axis = -(-npixel // ts)  # tiles per axis
    if ntile_axis * ts != npixel:
        raise ValueError(f"tile {ts} must divide npixel {npixel}")
    ntiles = ntile_axis * ntile_axis

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

    if plane_idx is None:
        tid = tv * ntile_axis + tu
        tid = jnp.where(in_grid, tid, ntiles * nplanes)
        u_all, v_all, vals_all, tid_all = u_pix, v_pix, vals, tid
        ntot = ntiles
    elif plane_frac is None:
        # nearest-plane assignment: one entry per visibility
        ntot = ntiles * nplanes
        tid = (plane_idx * ntiles + tv * ntile_axis + tu).astype(jnp.int32)
        tid = jnp.where(in_grid, tid, jnp.asarray(ntot, jnp.int32))
        u_all, v_all, vals_all, tid_all = u_pix, v_pix, vals, tid
    elif w_order == 2:
        # quadratic (3-plane Lagrange) w-interpolation: plane_idx is the
        # CENTRE plane (clipped to [1, nplanes-2]) and plane_frac the
        # signed offset x = t - j in [-0.5, 0.5]; weights
        # x(x-1)/2, 1-x^2, x(x+1)/2 sum to 1 and interpolate e^{i a w}
        # to third order in the plane spacing (vs second for linear) —
        # the deep-f64 regimes' limiter (accuracy.py)
        x = plane_frac.astype(vals.dtype)
        base = (tv * ntile_axis + tu).astype(jnp.int32)
        ntot = ntiles * nplanes
        trash = jnp.asarray(ntot, jnp.int32)
        tids = [
            jnp.where(in_grid, (plane_idx + dj) * ntiles + base, trash)
            for dj in (-1, 0, 1)
        ]
        wts = [0.5 * x * (x - 1.0), 1.0 - x * x, 0.5 * x * (x + 1.0)]
        u_all = jnp.concatenate([u_pix] * 3)
        v_all = jnp.concatenate([v_pix] * 3)
        vals_all = jnp.concatenate([vals * wt for wt in wts])
        tid_all = jnp.concatenate(tids)
    elif w_order >= 4:
        # ES-kernel w-gridding (ducc0's "improved w-stacking", Arras+
        # 2021; imaging/ng.py's production backend): each vis feeds
        # w_order neighbouring planes with exponential-of-semicircle
        # weights, and the image is divided by the kernel's transform
        # evaluated at wstep*(n-1) (imaging.w_kernel_correction). Unlike
        # polynomial interpolation — whose error grows as
        # (wstep*(n-1))^order and so blows up toward the image EDGE —
        # this bounds the w error uniformly over the field at the
        # kernel's aliasing floor, with nw ~ sigma_w * 4*wmax*(fov/2)^2
        # + w_order planes (vs the thousands the polynomial laws need
        # for edge sources at deep epsilon).
        # plane_idx = first tap plane j0, plane_frac = t - j0 with t
        # the continuous plane coordinate (imaging._w_planes).
        ssw = w_order
        half_w = ssw / 2.0
        tf = plane_frac.astype(u_pix.dtype)  # real: es_kernel clips nu^2
        base = (tv * ntile_axis + tu).astype(jnp.int32)
        ntot = ntiles * nplanes
        trash = jnp.asarray(ntot, jnp.int32)
        tids = [
            jnp.where(in_grid, (plane_idx + k) * ntiles + base, trash)
            for k in range(ssw)
        ]
        wts = [
            es_kernel((k - tf) / half_w, ssw, w_beta) for k in range(ssw)
        ]
        u_all = jnp.concatenate([u_pix] * ssw)
        v_all = jnp.concatenate([v_pix] * ssw)
        vals_all = jnp.concatenate(
            [vals * wt.astype(vals.dtype) for wt in wts]
        )
        tid_all = jnp.concatenate(tids)
    else:
        # duplicate each vis onto its two neighbouring w-planes
        frac = plane_frac.astype(vals.dtype)
        tid_lo = (plane_idx * ntiles + tv * ntile_axis + tu).astype(
            jnp.int32
        )
        tid_hi = ((plane_idx + 1) * ntiles + tv * ntile_axis + tu).astype(
            jnp.int32
        )
        ntot = ntiles * nplanes
        trash = jnp.asarray(ntot, jnp.int32)
        tid_lo = jnp.where(in_grid, tid_lo, trash)
        tid_hi = jnp.where(in_grid, tid_hi, trash)
        u_all = jnp.concatenate([u_pix, u_pix])
        v_all = jnp.concatenate([v_pix, v_pix])
        vals_all = jnp.concatenate(
            [vals * (1.0 - frac), vals * frac]
        )
        tid_all = jnp.concatenate([tid_lo, tid_hi])

    n = u_all.shape[0]
    # optional compensated split coordinates: the (hi, lo) residuals ride
    # the same sort/gather path and the kernel subtracts them after the
    # small hi difference (full f64 positional accuracy in f32 kernels)
    ncop = n // u_pix.shape[0]
    if u_lo is not None:
        ulo_all = (
            jnp.concatenate([u_lo] * ncop) if ncop > 1 else u_lo
        ).astype(u_all.dtype)
        vlo_all = (
            jnp.concatenate([v_lo] * ncop) if ncop > 1 else v_lo
        ).astype(u_all.dtype)
        tid_s, u_s, v_s, vr_s, vi_s, ulo_s, vlo_s = jax.lax.sort(
            (
                tid_all,
                u_all,
                v_all,
                jnp.real(vals_all),
                jnp.imag(vals_all),
                ulo_all,
                vlo_all,
            ),
            num_keys=1,
        )
    else:
        ulo_s = vlo_s = None
        # key-value sort carrying all payloads through the sort network:
        # much faster on TPU than argsort + random gathers
        tid_s, u_s, v_s, vr_s, vi_s = jax.lax.sort(
            (
                tid_all,
                u_all,
                v_all,
                jnp.real(vals_all),
                jnp.imag(vals_all),
            ),
            num_keys=1,
        )

    starts, counts = sorted_seg_bounds(tid_s, ntot)

    # units: fixed-size chunks of the sorted stream, one tile per unit
    unit_counts = -(-counts // unit)  # ceil
    unit_offsets = jnp.concatenate(
        [jnp.zeros((1,), unit_counts.dtype), jnp.cumsum(unit_counts)]
    )
    max_units = n // unit + ntot + 1
    uidx = jnp.arange(max_units)
    # tile owning each unit slot
    unit_tile = (
        jnp.searchsorted(unit_offsets, uidx, side="right") - 1
    ).astype(jnp.int32)
    unit_tile_c = jnp.clip(unit_tile, 0, ntot - 1)
    k_within = uidx - unit_offsets[unit_tile_c]
    unit_start = starts[unit_tile_c] + k_within * unit
    unit_valid = uidx < unit_offsets[-1]
    # rows of the sorted stream each unit covers
    take = unit_start[:, None] + jnp.arange(unit)[None, :]
    row_valid = (
        take < (starts[unit_tile_c] + counts[unit_tile_c])[:, None]
    ) & unit_valid[:, None]
    take = jnp.clip(take, 0, n - 1)

    tv0 = (
        (unit_tile_c % ntiles) // ntile_axis * ts
    ).astype(u_s.dtype)
    tu0 = ((unit_tile_c % ntiles) % ntile_axis * ts).astype(u_s.dtype)

    rdtype = u_s.dtype

    # rearrange the sorted stream into the unit layout with one
    # (mostly-sequential) gather per field, outside the compute loop
    flat_take = take.reshape(-1)
    uu_u = u_s[flat_take].reshape(max_units, unit)
    vv_u = v_s[flat_take].reshape(max_units, unit)
    vr_u = jnp.where(row_valid, vr_s[flat_take].reshape(max_units, unit), 0.0)
    vi_u = jnp.where(row_valid, vi_s[flat_take].reshape(max_units, unit), 0.0)
    if ulo_s is not None:
        ulo_u = ulo_s[flat_take].reshape(max_units, unit)
        vlo_u = vlo_s[flat_take].reshape(max_units, unit)
    else:
        ulo_u = jnp.zeros_like(uu_u)
        vlo_u = jnp.zeros_like(vv_u)

    r_cells = jnp.arange(buf, dtype=rdtype)
    half_f = jnp.asarray(half, dtype=rdtype)

    def unit_tiles(args):
        uu, vv, vr, vi, ulo, vlo, tv0_u, tu0_u = args
        # lane-major [UB, buf, C] kernel layout: the C (=unit) axis stays on
        # the 128-lane dimension through the matmul; the lo residual is
        # subtracted AFTER the small hi difference (compensated mode)
        # difference FIRST: (tv0 + r) - vv rounds the intermediate at
        # eps32 * npad (~5e-5 px at 768 — measured 1.6e-5 vis error on
        # chip); (tv0 - vv) is exactly rounded at eps32 * |small|
        kv = es_kernel(
            (
                ((tv0_u[:, None, None] - vv[:, None, :])
                 + r_cells[None, :, None])
                - vlo[:, None, :]
            )
            / half_f,
            support,
            beta,
        )
        ku = es_kernel(
            (
                ((tu0_u[:, None, None] - uu[:, None, :])
                 + r_cells[None, :, None])
                - ulo[:, None, :]
            )
            / half_f,
            support,
            beta,
        )
        tr = jnp.einsum(
            "urc,uxc->urx",
            kv * vr[:, None, :],
            ku,
            preferred_element_type=rdtype,
        )
        ti = jnp.einsum(
            "urc,uxc->urx",
            kv * vi[:, None, :],
            ku,
            preferred_element_type=rdtype,
        )
        return tr, ti

    # batch the units through lax.map to bound memory
    ub = 256
    pad_units = (-max_units) % ub
    nb = (max_units + pad_units) // ub

    def padr(x):
        return jnp.pad(x, ((0, pad_units),) + ((0, 0),) * (x.ndim - 1))

    tr, ti = jax.lax.map(
        unit_tiles,
        (
            padr(uu_u).reshape(nb, ub, unit),
            padr(vv_u).reshape(nb, ub, unit),
            padr(vr_u).reshape(nb, ub, unit),
            padr(vi_u).reshape(nb, ub, unit),
            padr(ulo_u).reshape(nb, ub, unit),
            padr(vlo_u).reshape(nb, ub, unit),
            padr(tv0).reshape(nb, ub),
            padr(tu0).reshape(nb, ub),
        ),
    )
    tr = tr.reshape(-1, buf, buf)[:max_units]
    ti = ti.reshape(-1, buf, buf)[:max_units]

    # reduce units onto tiles: units of one tile are consecutive, so a
    # prefix-sum over the unit axis + differences at tile boundaries gives
    # the segmented reduction with no scatter and no O(U*ntiles) matmul
    zeros1 = jnp.zeros((1, buf, buf), dtype=rdtype)
    cr = jnp.concatenate([zeros1, jnp.cumsum(tr, axis=0)])
    ci = jnp.concatenate([zeros1, jnp.cumsum(ti, axis=0)])
    lo = jnp.clip(unit_offsets[:-1], 0, max_units)
    hi = jnp.clip(unit_offsets[1:], 0, max_units)
    acc_r = cr[hi] - cr[lo]
    acc_i = ci[hi] - ci[lo]
    acc = jax.lax.complex(acc_r, acc_i)  # [ntot, buf, buf]

    # overlap-add tiles into per-plane grids with reshape + roll
    acc = acc.reshape(nplanes, ntile_axis, ntile_axis, buf, buf)

    def assemble(tiles):
        # tiles: [ntv, ntu, buf, buf]
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
        grid = grid + jnp.roll(
            jnp.roll(flatten(d), ts, axis=0), ts, axis=1
        )
        return grid

    grids = jax.vmap(assemble)(acc)
    if squeeze:
        return grids[0]
    return grids


def _extract_tiles(grid, ts: int, support: int):
    """Inverse of the overlap-add: all (ts+S)^2 tiles of a [n, n] grid as
    [ntv, ntu, buf, buf], via reshapes + rolls (no gather)."""
    n = grid.shape[-1]
    ntv = n // ts
    buf = ts + support

    def blocks(g):
        return g.reshape(ntv, ts, ntv, ts).transpose(0, 2, 1, 3)

    a = blocks(grid)  # [ntv, ntu, ts, ts]
    b = blocks(jnp.roll(grid, -ts, axis=1))[..., :, :support]
    c = blocks(jnp.roll(grid, -ts, axis=0))[..., :support, :]
    d = blocks(jnp.roll(jnp.roll(grid, -ts, axis=0), -ts, axis=1))[
        ..., :support, :support
    ]
    top = jnp.concatenate([a, b], axis=-1)  # [.., ts, buf]
    bottom = jnp.concatenate([c, d], axis=-1)  # [.., S, buf]
    return jnp.concatenate([top, bottom], axis=-2)  # [ntv, ntu, buf, buf]


@partial(
    jax.jit,
    static_argnames=(
        "support", "nplanes", "tile", "unit", "beta", "w_order",
        "w_beta",
    ),
)
def tiled_degrid(
    u_pix,
    v_pix,
    grids,
    plane_idx=None,
    plane_frac=None,
    u_lo=None,
    v_lo=None,
    *,
    support: int = 8,
    nplanes: int = 1,
    tile: int = 56,
    unit: int = 1024,
    beta: float | None = None,
    w_order: int = 1,
    w_beta: float | None = None,
):
    """Degrid visibilities from (optionally w-stacked) grids without random
    per-cell gathers: the adjoint of :func:`tiled_grid`.

    Visibilities sort by tile, whole tiles are extracted with reshapes and
    gathered per unit (contiguous), and per-unit values form as two batched
    matmuls: vals = diag(kv . tile . ku^T). A second key-value sort restores
    the original order (TPU sorts are far cheaper than random gathers).

    :param grids: [nplanes, npixel, npixel] complex (or [npixel, npixel])
    :return: [N] complex visibilities
    """
    if grids.ndim == 2:
        grids = grids[None]
    npixel = grids.shape[-1]
    if w_order == 2 and plane_idx is not None and nplanes < 3:
        raise ValueError(
            f"w_order=2 needs nplanes >= 3, got {nplanes}"
        )
    if w_order >= 4 and plane_idx is not None and nplanes < w_order + 1:
        raise ValueError(
            f"w_order={w_order} (ES w-kernel) needs nplanes >= "
            f"{w_order + 1}, got {nplanes}"
        )
    half = support // 2
    ts = tile
    buf = ts + support
    ntile_axis = npixel // ts
    if ntile_axis * ts != npixel:
        raise ValueError(f"tile {ts} must divide npixel {npixel}")
    ntiles = ntile_axis * ntile_axis

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
    tu = iu0c // ts
    tv = iv0c // ts
    nvis = u_pix.shape[0]
    rdtype = u_pix.dtype

    if plane_idx is None:
        tid = jnp.where(
            in_grid, tv * ntile_axis + tu, jnp.asarray(ntiles, jnp.int32)
        )
        ntot = ntiles
        u_all, v_all, tid_all = u_pix, v_pix, tid
        wgt_all = jnp.where(in_grid, jnp.ones_like(u_pix), 0.0)
        n_entries = nvis
    elif plane_frac is None:
        # nearest-plane assignment: one entry per visibility
        ntot = ntiles * nplanes
        base = tv * ntile_axis + tu
        tid = jnp.where(
            in_grid,
            (plane_idx * ntiles + base).astype(jnp.int32),
            jnp.asarray(ntot, jnp.int32),
        )
        u_all, v_all, tid_all = u_pix, v_pix, tid
        wgt_all = jnp.where(in_grid, jnp.ones_like(u_pix), 0.0)
        n_entries = nvis
    elif w_order == 2:
        # quadratic 3-plane stencil (see tiled_grid)
        x = plane_frac.astype(rdtype)
        base = tv * ntile_axis + tu
        ntot = ntiles * nplanes
        trash = jnp.asarray(ntot, jnp.int32)
        ig = jnp.where(in_grid, 1.0, 0.0)
        tid_all = jnp.concatenate([
            jnp.where(in_grid, (plane_idx + dj) * ntiles + base, trash)
            for dj in (-1, 0, 1)
        ])
        u_all = jnp.concatenate([u_pix] * 3)
        v_all = jnp.concatenate([v_pix] * 3)
        wgt_all = jnp.concatenate([
            0.5 * x * (x - 1.0) * ig,
            (1.0 - x * x) * ig,
            0.5 * x * (x + 1.0) * ig,
        ])
        n_entries = 3 * nvis
    elif w_order >= 4:
        # ES-kernel w-gridding (see tiled_grid): w_order tap planes with
        # exponential-of-semicircle weights
        ssw = w_order
        half_w = ssw / 2.0
        tf = plane_frac.astype(rdtype)
        base = tv * ntile_axis + tu
        ntot = ntiles * nplanes
        trash = jnp.asarray(ntot, jnp.int32)
        ig = jnp.where(in_grid, 1.0, 0.0)
        tid_all = jnp.concatenate([
            jnp.where(in_grid, (plane_idx + k) * ntiles + base, trash)
            for k in range(ssw)
        ])
        u_all = jnp.concatenate([u_pix] * ssw)
        v_all = jnp.concatenate([v_pix] * ssw)
        wgt_all = jnp.concatenate([
            es_kernel((k - tf) / half_w, ssw, w_beta).astype(rdtype) * ig
            for k in range(ssw)
        ])
        n_entries = ssw * nvis
    else:
        frac = plane_frac.astype(rdtype)
        base = tv * ntile_axis + tu
        ntot = ntiles * nplanes
        trash = jnp.asarray(ntot, jnp.int32)
        tid_lo = jnp.where(in_grid, plane_idx * ntiles + base, trash)
        tid_hi = jnp.where(in_grid, (plane_idx + 1) * ntiles + base, trash)
        u_all = jnp.concatenate([u_pix, u_pix])
        v_all = jnp.concatenate([v_pix, v_pix])
        tid_all = jnp.concatenate([tid_lo, tid_hi])
        ig = jnp.where(in_grid, 1.0, 0.0)
        wgt_all = jnp.concatenate([(1.0 - frac) * ig, frac * ig])
        n_entries = 2 * nvis

    entry_idx = jnp.arange(n_entries, dtype=jnp.int32)
    ncop = n_entries // nvis
    if u_lo is not None:
        ulo_all = (
            jnp.concatenate([u_lo] * ncop) if ncop > 1 else u_lo
        ).astype(u_all.dtype)
        vlo_all = (
            jnp.concatenate([v_lo] * ncop) if ncop > 1 else v_lo
        ).astype(u_all.dtype)
        tid_s, u_s, v_s, w_s, idx_s, ulo_s, vlo_s = jax.lax.sort(
            (tid_all, u_all, v_all, wgt_all, entry_idx, ulo_all,
             vlo_all),
            num_keys=1,
        )
    else:
        ulo_s = vlo_s = None
        tid_s, u_s, v_s, w_s, idx_s = jax.lax.sort(
            (tid_all, u_all, v_all, wgt_all, entry_idx), num_keys=1
        )

    # partition over ntot+1 tiles INCLUDING the trash tile, so every entry
    # (even out-of-grid ones, whose weights are zero) owns exactly one unit
    # slot — required for the position-preserving back-sort below
    ntot_p = ntot + 1
    starts, counts = sorted_seg_bounds(tid_s, ntot_p)
    unit_counts = -(-counts // unit)
    unit_offsets = jnp.concatenate(
        [jnp.zeros((1,), unit_counts.dtype), jnp.cumsum(unit_counts)]
    )
    max_units = n_entries // unit + ntot_p + 1
    uidx = jnp.arange(max_units)
    unit_tile = (
        jnp.searchsorted(unit_offsets, uidx, side="right") - 1
    ).astype(jnp.int32)
    unit_tile_p = jnp.clip(unit_tile, 0, ntot_p - 1)
    k_within = uidx - unit_offsets[unit_tile_p]
    unit_start = starts[unit_tile_p] + k_within * unit
    unit_valid = uidx < unit_offsets[-1]
    take = unit_start[:, None] + jnp.arange(unit)[None, :]
    row_valid = (
        take < (starts[unit_tile_p] + counts[unit_tile_p])[:, None]
    ) & unit_valid[:, None]
    take = jnp.clip(take, 0, n_entries - 1)

    # geometry/tile lookup uses the clipped real-tile id (trash values are
    # weight-zeroed, their tile content is irrelevant)
    unit_tile_c = jnp.clip(unit_tile_p, 0, ntot - 1)
    tv0 = ((unit_tile_c % ntiles) // ntile_axis * ts).astype(rdtype)
    tu0 = ((unit_tile_c % ntiles) % ntile_axis * ts).astype(rdtype)

    # whole tiles per plane, then one contiguous gather per unit
    tiles = jax.vmap(lambda g: _extract_tiles(g, ts, support))(grids)
    tiles = tiles.reshape(nplanes * ntiles, buf, buf)
    tiles_r = jnp.real(tiles)
    tiles_i = jnp.imag(tiles)

    flat_take = take.reshape(-1)
    uu_u = u_s[flat_take].reshape(max_units, unit)
    vv_u = v_s[flat_take].reshape(max_units, unit)
    ww_u = jnp.where(row_valid, w_s[flat_take].reshape(max_units, unit), 0.0)
    if ulo_s is not None:
        ulo_u = ulo_s[flat_take].reshape(max_units, unit)
        vlo_u = vlo_s[flat_take].reshape(max_units, unit)
    else:
        ulo_u = jnp.zeros_like(uu_u)
        vlo_u = jnp.zeros_like(vv_u)

    r_cells = jnp.arange(buf, dtype=rdtype)
    half_f = jnp.asarray(half, dtype=rdtype)

    def unit_vals(args):
        uu, vv, ww, ulo, vlo, t_idx, tv0_u, tu0_u = args
        tr = tiles_r[t_idx]  # [UB, buf, buf] contiguous gather
        ti = tiles_i[t_idx]
        # difference FIRST (see tiled_grid): no eps32*npad intermediate
        kv = es_kernel(
            (
                ((tv0_u[:, None, None] - vv[:, None, :])
                 + r_cells[None, :, None])
                - vlo[:, None, :]
            )
            / half_f,
            support,
            beta,
        )  # [UB, buf, C]
        ku = es_kernel(
            (
                ((tu0_u[:, None, None] - uu[:, None, :])
                 + r_cells[None, :, None])
                - ulo[:, None, :]
            )
            / half_f,
            support,
            beta,
        )
        # vals[c] = sum_{r,x} kv[r,c] T[r,x] ku[x,c]
        tr1 = jnp.einsum(
            "urx,uxc->urc", tr, ku, preferred_element_type=rdtype
        )
        vi1 = jnp.einsum(
            "urx,uxc->urc", ti, ku, preferred_element_type=rdtype
        )
        vr = jnp.sum(kv * tr1, axis=1) * ww
        vi = jnp.sum(kv * vi1, axis=1) * ww
        return vr, vi

    ub = 128
    pad_units = (-max_units) % ub
    nb = (max_units + pad_units) // ub

    def padr(x):
        return jnp.pad(x, ((0, pad_units),) + ((0, 0),) * (x.ndim - 1))

    vr, vi = jax.lax.map(
        unit_vals,
        (
            padr(uu_u).reshape(nb, ub, unit),
            padr(vv_u).reshape(nb, ub, unit),
            padr(ww_u).reshape(nb, ub, unit),
            padr(ulo_u).reshape(nb, ub, unit),
            padr(vlo_u).reshape(nb, ub, unit),
            padr(unit_tile_c).reshape(nb, ub),
            padr(tv0).reshape(nb, ub),
            padr(tu0).reshape(nb, ub),
        ),
    )
    vr = vr.reshape(-1)
    vi = vi.reshape(-1)

    # map unit-slot values back to sorted entry positions, then restore the
    # original order with a second key-value sort
    slot_entry = jnp.where(
        row_valid.reshape(-1),
        idx_s[take.reshape(-1)],
        jnp.asarray(n_entries, jnp.int32),
    )
    npad_slots = vr.shape[0] - slot_entry.shape[0]
    slot_entry = jnp.pad(
        slot_entry, (0, npad_slots), constant_values=n_entries
    )
    _, vr_o, vi_o = jax.lax.sort((slot_entry, vr, vi), num_keys=1)
    vr_o = vr_o[:n_entries]
    vi_o = vi_o[:n_entries]
    vals = jax.lax.complex(vr_o, vi_o)
    if plane_idx is None or plane_frac is None or n_entries == nvis:
        return vals
    ncopies = n_entries // nvis  # 2 linear / 3 quadratic / ssw eskernel
    out = vals[:nvis]
    for k in range(1, ncopies):
        out = out + vals[k * nvis:(k + 1) * nvis]
    return out
