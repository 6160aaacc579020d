"""Reusable gridding plans: amortize the geometry sort across calls.

The fused Pallas gridder/degridder (gridding_fused.py) spends ~40% of an
invert at the 10M-vis BASELINE config in the N-entry segment sort. The
reference re-sorts on every call (ducc0 wgridder inside
/root/reference/src/ska_sdp_func_python/imaging/ng.py:146-293 re-bins uvw
per invocation), but imaging pipelines call invert/predict many times on
the SAME uvw coordinates — CLEAN major cycles, self-cal iterations. A
:class:`GridPlan` runs the expensive 5/6-operand geometry sort once and
keeps the sorted (u, v, frac) stream, segment bounds, slot maps, and the
rank permutation; each subsequent call pays only a cheap 3-operand value
sort (values ride a precomputed rank key), or nothing at all when the
caller stays in the sorted domain (see ``sort_values``/``unsort_values``).

Measured on one v5e at 10M entries: full 6-op sort 100 ms, 3-op value
sort 74 ms, sorted-domain 0 ms; gathers (230 ms) are never used.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from .gridding_fused import (
    _degrid_execute,
    _degrid_slots,
    _grid_execute,
    _grid_slots,
    _payload_stack,
    _value_rows,
)
from .gridding_tiled import sorted_seg_bounds

__all__ = [
    "GridPlan",
    "make_grid_plan",
    "grid_with_plan",
    "degrid_with_plan",
    "sort_values",
    "sort_values_real",
    "unsort_values",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "geo",
        "rank",
        "starts",
        "counts",
        "starts_p",
        "counts_p",
        "slot_seg",
        "slot_col",
        "slot_first",
        "gs_seg",
        "gs_col",
        "gs_first",
    ],
    meta_fields=[
        "n",
        "npixel",
        "support",
        "nplanes",
        "tile",
        "chunk",
        "wstacked",
        "nearest",
        "nslots",
        "beta",
    ],
)
@dataclass(frozen=True)
class GridPlan:
    """Precomputed geometry for the fused gridder/degridder.

    ``geo`` rows: [u_s, v_s, frac_s, ib_orig, ib_sorted, 0, 0, 0] where
    ib_orig/ib_sorted are f32-bitcast i32 back-sort keys returning degrid
    outputs in original / sorted order. The grid path overwrites rows 3-4
    with the (sorted) visibility values, matching the grid kernel's
    payload layout. Support-8 plans instead carry the 24-row tap payload
    (rows 0-1 become in-tile offsets, rows 8-23 the precomputed rotated
    ES taps — see gridding_fused._payload_stack); rows 2-4 are the same.
    """

    geo: jax.Array
    rank: jax.Array
    starts: jax.Array
    counts: jax.Array
    starts_p: jax.Array
    counts_p: jax.Array
    slot_seg: jax.Array
    slot_col: jax.Array
    slot_first: jax.Array
    gs_seg: jax.Array
    gs_col: jax.Array
    gs_first: jax.Array
    n: int
    npixel: int
    support: int
    nplanes: int
    tile: int
    chunk: int
    wstacked: bool
    nearest: bool
    nslots: int
    # ES kernel shape parameter; None = the sigma-2 default (2.3 S)
    beta: float | None = None

    @property
    def nseg(self) -> int:
        nta = self.npixel // self.tile
        if self.wstacked:
            return nta * nta * (self.nplanes - 1)
        if self.nearest:
            return nta * nta * self.nplanes
        return nta * nta


@partial(
    jax.jit,
    static_argnames=(
        "npixel", "support", "nplanes", "tile", "chunk", "beta"
    ),
)
def make_grid_plan(
    u_pix,
    v_pix,
    plane_idx=None,
    plane_frac=None,
    *,
    npixel: int,
    support: int = 8,
    nplanes: int = 1,
    tile: int = 64,
    chunk: int = 512,
    beta: float | None = None,
    u_lo=None,
    v_lo=None,
    taps_scale=None,
) -> GridPlan:
    """Build a reusable plan from fractional grid coordinates.

    Same (u_pix, v_pix, plane_idx, plane_frac) contract as
    ``fused_grid_wstack``; the returned plan serves both gridding and
    degridding on these coordinates. ``u_lo``/``v_lo``: f32 residuals of
    split (hi, lo) coordinate pairs — the compensated mode that keeps
    f64 positional precision on an f32-only device (make_imaging_plan
    computes the split host-side). ``taps_scale``: optional [N] per-entry
    factor folded into the stored ku taps at zero runtime cost — the
    ES-kernel w-gridding plan mode ships each visibility as
    ``w_support/2`` entry copies whose pair weight (a+b) rides here
    (make_imaging_plan w_interp="eskernel"); requires the support-8 tap
    payload.
    """
    from .gridding_fused import use_tap_payload

    if taps_scale is not None and not use_tap_payload(support, tile):
        raise ValueError(
            "taps_scale needs the support-8 tap payload "
            f"(support={support}, tile={tile})"
        )
    # f64 coordinates are kept through the sort so the payload taps are
    # evaluated at full positional precision (cast to f32 only at the
    # tap store, see _payload_stack)
    if u_pix.dtype != jnp.float64:
        u_pix = u_pix.astype(jnp.float32)
        v_pix = v_pix.astype(jnp.float32)
    half = support // 2
    ts = tile
    ntile_axis = npixel // ts
    if ntile_axis * ts != npixel:
        raise ValueError(f"tile {ts} must divide npixel {npixel}")
    ntiles = ntile_axis * ntile_axis
    wstacked = (
        plane_idx is not None and plane_frac is not None and nplanes > 1
    )
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
        frac = jnp.zeros(u_pix.shape, jnp.float32)
        seg = (p0 * ntiles + base).astype(jnp.int32)
    else:
        frac = jnp.zeros(u_pix.shape, jnp.float32)
        seg = base.astype(jnp.int32)
    seg = jnp.where(in_grid, seg, jnp.asarray(nseg, jnp.int32))

    n = u_pix.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    idx_bits = jax.lax.bitcast_convert_type(iota, jnp.float32)
    comp = u_lo is not None
    ops = (seg, u_pix, v_pix, frac, idx_bits) + (
        (u_lo.astype(jnp.float32), v_lo.astype(jnp.float32))
        if comp
        else ()
    )
    if taps_scale is not None:
        ops = ops + (taps_scale.astype(jnp.float32),)
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    seg_s, u_s, v_s, f_s, ib_s = sorted_ops[:5]
    ulo_s, vlo_s = (sorted_ops[5], sorted_ops[6]) if comp else (None, None)
    ts_s = sorted_ops[-1] if taps_scale is not None else None
    perm = jax.lax.bitcast_convert_type(ib_s, jnp.int32)
    # rank[i] = sorted position of original entry i (perm's inverse)
    _, rank = jax.lax.sort((perm, iota), num_keys=1)

    from .gridding_fused import _pad_stream

    npad = _pad_stream(n, chunk)
    pz = jnp.zeros((npad,), jnp.float32)
    u_s = jnp.concatenate([u_s, pz])
    v_s = jnp.concatenate([v_s, pz])
    f_s = jnp.concatenate([f_s, pz])
    ib_s = jnp.concatenate([ib_s, pz])
    if comp:
        ulo_s = jnp.concatenate([ulo_s, pz])
        vlo_s = jnp.concatenate([vlo_s, pz])
    if ts_s is not None:
        ts_s = jnp.concatenate([ts_s, pz])
    ib2 = jax.lax.bitcast_convert_type(
        jnp.arange(n + npad, dtype=jnp.int32), jnp.float32
    )
    geo = _payload_stack(
        u_s, v_s, f_s, ib_s, ib2, npixel=npixel, support=support,
        tile=tile, beta=beta, u_lo=ulo_s, v_lo=vlo_s,
        taps_scale=ts_s,
    )  # [8 or 24, Npad]

    starts, counts = sorted_seg_bounds(seg_s, nseg)
    starts_p, counts_p = sorted_seg_bounds(seg_s, nseg + 1)
    nslots = n // chunk + nseg + 3
    slot_seg, slot_col, slot_first = _degrid_slots(
        starts_p,
        counts_p,
        nslots=nslots,
        ncols=(n + npad) // chunk,
        nseg=nseg,
        chunk=chunk,
    )
    gs_seg, gs_col, gs_first = _grid_slots(
        starts,
        counts,
        nslots=nslots,
        ncols=(n + npad) // chunk,
        nseg=nseg,
        chunk=chunk,
    )
    return GridPlan(
        geo=geo,
        rank=rank,
        starts=starts,
        counts=counts,
        starts_p=starts_p,
        counts_p=counts_p,
        slot_seg=slot_seg,
        slot_col=slot_col,
        slot_first=slot_first,
        gs_seg=gs_seg,
        gs_col=gs_col,
        gs_first=gs_first,
        n=n,
        npixel=npixel,
        support=support,
        nplanes=nplanes,
        tile=tile,
        chunk=chunk,
        wstacked=wstacked,
        nearest=nearest,
        nslots=nslots,
        beta=beta,
    )


@jax.jit
def sort_values(plan: GridPlan, vals):
    """Bring per-visibility values into the plan's sorted order
    (one 3-operand sort keyed by the precomputed rank)."""
    _, vr_s, vi_s = jax.lax.sort(
        (plan.rank, jnp.real(vals).astype(jnp.float32),
         jnp.imag(vals).astype(jnp.float32)),
        num_keys=1,
    )
    return jax.lax.complex(vr_s, vi_s)


@jax.jit
def sort_values_real(plan: GridPlan, x):
    """Bring a real per-visibility array (e.g. imaging weights) into the
    plan's sorted order."""
    _, x_s = jax.lax.sort(
        (plan.rank, x.astype(jnp.float32)), num_keys=1
    )
    return x_s


@jax.jit
def unsort_values(plan: GridPlan, vals_sorted):
    """Inverse of :func:`sort_values`: sorted order -> original order."""
    perm = jax.lax.bitcast_convert_type(
        plan.geo[3, : plan.n], jnp.int32
    )
    _, vr, vi = jax.lax.sort(
        (perm, jnp.real(vals_sorted).astype(jnp.float32),
         jnp.imag(vals_sorted).astype(jnp.float32)),
        num_keys=1,
    )
    return jax.lax.complex(vr, vi)


@partial(
    jax.jit, static_argnames=("values_sorted", "interpret", "precision")
)
def grid_with_plan(
    plan: GridPlan,
    vals,
    *,
    values_sorted: bool = False,
    interpret: bool | None = None,
    precision: str | None = "config",
):
    """Grid (weighted) visibility values using a precomputed plan.

    Returns [nplanes, npixel, npixel] complex grids ([npixel, npixel]
    when the plan is single-plane). Pass ``values_sorted=True`` when
    ``vals`` is already in plan order (from :func:`sort_values` or a
    sorted-domain ``degrid_with_plan``) to skip the value sort entirely.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if values_sorted:
        vr_s = jnp.real(vals).astype(jnp.float32)
        vi_s = jnp.imag(vals).astype(jnp.float32)
    else:
        # sort straight to planar f32 rows (skipping the complex
        # round-trip of sort_values, whose interleave/deinterleave is
        # ~30 ms at 10M entries on a v5e)
        _, vr_s, vi_s = jax.lax.sort(
            (plan.rank, jnp.real(vals).astype(jnp.float32),
             jnp.imag(vals).astype(jnp.float32)),
            num_keys=1,
        )
    npad = plan.geo.shape[1] - plan.n
    pz = jnp.zeros((npad,), jnp.float32)
    # values ride a separate packed [8, Npad//4] row array: the big
    # geometry payload is reused untouched (no 1 GB-scale copy per call)
    vals_rows = _value_rows(
        jnp.concatenate([vr_s, pz]), jnp.concatenate([vi_s, pz]),
        plan.chunk,
    )
    if plan.wstacked:
        nseg_planes, nplanes_out = plan.nplanes - 1, 2
    elif plan.nearest:
        nseg_planes, nplanes_out = plan.nplanes, 1
    else:
        nseg_planes, nplanes_out = 1, 1
    grids = _grid_execute(
        plan.starts,
        plan.counts,
        plan.gs_seg,
        plan.gs_col,
        plan.gs_first,
        plan.geo,
        vals_rows,
        npixel=plan.npixel,
        support=plan.support,
        nplanes=plan.nplanes,
        nseg_planes=nseg_planes,
        nplanes_out=nplanes_out,
        wstacked=plan.wstacked,
        tile=plan.tile,
        chunk=plan.chunk,
        interpret=interpret,
        precision=_resolve_precision(precision),
        beta=plan.beta,
    )
    if plan.nplanes == 1 and not (plan.wstacked or plan.nearest):
        return grids[0]
    return grids


def _resolve_precision(precision):
    from ..config import gridder_precision

    return gridder_precision(precision)


@partial(
    jax.jit, static_argnames=("to_sorted", "interpret", "precision")
)
def degrid_with_plan(
    plan: GridPlan,
    grids,
    *,
    to_sorted: bool = False,
    interpret: bool | None = None,
    precision: str | None = "config",
):
    """Degrid visibilities from (w-stacked) grids using a precomputed
    plan. ``to_sorted=True`` returns values in plan order (feedable
    straight back into ``grid_with_plan(values_sorted=True)`` without any
    per-call sort)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if grids.ndim == 2:
        grids = grids[None]
    grids = grids.astype(jnp.complex64)
    vr, vi = _degrid_execute(
        plan.slot_seg,
        plan.slot_col,
        plan.slot_first,
        plan.starts_p,
        plan.counts_p,
        plan.geo,
        grids,
        n=plan.n,
        nslots=plan.nslots,
        npixel=plan.npixel,
        support=plan.support,
        nplanes=plan.nplanes,
        nseg=plan.nseg,
        wstacked=plan.wstacked,
        tile=plan.tile,
        chunk=plan.chunk,
        interpret=interpret,
        key_row=None if to_sorted else 3,
        precision=_resolve_precision(precision),
        beta=plan.beta,
    )
    return jax.lax.complex(vr, vi)
