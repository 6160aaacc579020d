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

Third-generation refinement (the *tap payload*): the dense [buf, chunk]
ES-kernel factor evaluation (exp+sqrt over every buffer row, though each
visibility only touches ``support`` of them) dominated the kernel at
~9x wasted VPU work. The separable kernel taps depend only on the
coordinate fractions — not on the visibility values — so for the
standard support-8 configuration they are precomputed once (at plan
build / stream prep, amortised across calls) and shipped in an expanded
[24, N] payload, pre-rotated so tap row ``m`` lands on buffer rows
congruent to ``m`` (mod 8): 8 consecutive taps hit each row-class
mod 8 exactly once. The kernel then reconstructs the dense factor with
one 9x tile-broadcast plus a [rel, rel+8) window mask — ~7x fewer VPU
ops than evaluating exp/sqrt densely, bit-identical results.
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


def _cfg_precision(p):
    from ..config import gridder_precision

    return gridder_precision(p)


def _dot(lhs, rhs, dn, precision):
    """dot_general with an extra TPU-native precision mode.

    ``precision="bf16x3"`` emulates XLA's HIGH (3-pass bf16) matmul, which
    Mosaic does not lower natively: split both operands into bf16
    high/low parts and sum the three significant single-pass products
    (hi.hi + hi.lo + lo.hi; the lo.lo term is ~2^-18 relative and
    dropped). Measured ~4e-6 relative grid error vs HIGHEST at half its
    MXU cost. Any other value passes through to dot_general.
    """
    if precision == "bf16x3":
        lh = lhs.astype(jnp.bfloat16).astype(jnp.float32)
        ll = lhs - lh
        rh = rhs.astype(jnp.bfloat16).astype(jnp.float32)
        rl = rhs - rh
        d = partial(
            jax.lax.dot_general,
            dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision="default",
        )
        return d(lh, rh) + (d(lh, rl) + d(ll, rh))
    return jax.lax.dot_general(
        lhs,
        rhs,
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def use_tap_payload(support: int, tile: int) -> bool:
    """Whether the precomputed-tap payload applies: the mod-8 rotation
    trick needs the taps to span exactly one row-class cycle (support 8)
    and the 9x tile-broadcast needs ``buf = tile + 8`` divisible by 8."""
    return support == 8 and tile % 8 == 0


def payload_nrows(support: int, tile: int) -> int:
    return 24 if use_tap_payload(support, tile) else 8


def _es_taps8(pix, i0, support: int, beta: float | None = None, lo=None):
    """The ``support`` separable ES-kernel taps of each coordinate,
    padded to 8 rows: taps[k, c] = es(i0_c + k - pix_c), the value the
    in-kernel dense evaluation produces at buffer row i0_c + k.

    ``lo``: optional f32 residual of a split (hi, lo) coordinate pair
    (compensated mode): ``i0 + k - pix`` is small (|.| <= support), so
    subtracting ``lo`` afterwards keeps the full f64 position in f32
    arithmetic."""
    half = support / 2.0
    if beta is None:
        beta = 2.3 * support
    # taps are evaluated at the coordinate dtype (f64 coordinates give
    # positionally-exact taps) and stored as f32
    k = jnp.arange(support, dtype=pix.dtype)[:, None]
    offs = i0.astype(pix.dtype)[None, :] + k - pix[None, :]
    if lo is not None:
        offs = offs - lo[None, :]
    nu = offs / half
    nu2 = jnp.clip(nu * nu, 0.0, 1.0)
    t = jnp.exp(beta * (jnp.sqrt(1.0 - nu2) - 1.0))
    t = jnp.where(jnp.abs(nu) < 1.0, t, 0.0).astype(jnp.float32)
    if support < 8:
        t = jnp.pad(t, ((0, 8 - support), (0, 0)))
    return t


def _rot8(taps8, idx):
    """Rotate each column's 8 taps so tap k sits at row (idx + k) mod 8 —
    i.e. out[m, c] = taps8[(m - idx_c) mod 8, c]."""
    rel8 = (idx % 8).astype(jnp.int32)
    out = jnp.zeros_like(taps8)
    for s in range(8):
        out = out + jnp.where(
            rel8[None, :] == s, jnp.roll(taps8, s, axis=0), 0.0
        )
    return out


def _value_rows(vr_s, vi_s, chunk: int):
    """[8, Npad//4] packed value-row array from padded f32 rows.

    Chunk c's (vr, vi) pair lands on rows (2*(c%4), 2*(c%4)+1), columns
    [(c//4)*chunk, (c//4+1)*chunk): four consecutive chunks share one
    aligned (8, chunk) block, so the kernel's value DMA traffic is 1/4 of
    the plain [8, Npad] layout (whose 6 rows were zero padding — 8-row
    blocks are required by the TPU sublane tiling; 2-row blocks measured
    ~2x slower) and Mosaic skips the re-fetch for the 3 revisits. Requires
    Npad % (4*chunk) == 0 (see ``_pad_stream``).
    """
    npad = vr_s.shape[0]
    nq = npad // (4 * chunk)
    vr_r = vr_s.reshape(nq, 4, chunk)
    vi_r = vi_s.reshape(nq, 4, chunk)
    packed = jnp.stack([vr_r, vi_r], axis=2)  # [nq, 4, 2, chunk]
    return packed.transpose(1, 2, 0, 3).reshape(8, npad // 4)


def _pad_stream(n: int, chunk: int) -> int:
    """Padding that chunk-aligns the sorted stream, adds one all-pad tail
    column, and rounds the total to a multiple of 4*chunk (the packed
    value-row layout needs whole 4-chunk groups)."""
    return (-n) % (4 * chunk) + 4 * chunk


def _payload_stack(u_s, v_s, f_s, r3, r4, *, npixel, support, tile,
                   beta: float | None = None, u_lo=None, v_lo=None,
                   taps_scale=None):
    """Stack the sorted per-entry stream into the kernel payload.

    Standard (support-8) configs get the 24-row tap payload:
    [rel_u, rel_v, frac, r3, r4, u_lo, v_lo, pad, rot_ku x8, rot_kv x8];
    other configs keep the 8-row coordinate payload
    [u, v, frac, r3, r4, u_lo, v_lo, pad] and the kernels evaluate the ES
    factors densely, subtracting the lo rows (zero when uncompensated).
    r3/r4 are the two caller rows (values or back-sort indices);
    u_lo/v_lo the f32 residuals of split (hi, lo) coordinates
    (compensated mode, see make_imaging_plan)."""
    z = jnp.zeros(u_s.shape, jnp.float32)
    ul = z if u_lo is None else u_lo.astype(jnp.float32)
    vl = z if v_lo is None else v_lo.astype(jnp.float32)
    if not use_tap_payload(support, tile):
        return jnp.stack(
            [u_s.astype(jnp.float32), v_s.astype(jnp.float32),
             f_s.astype(jnp.float32), r3, r4, ul, vl, z]
        )
    half = support // 2
    iu0 = jnp.floor(u_s).astype(jnp.int32) - (half - 1)
    iv0 = jnp.floor(v_s).astype(jnp.int32) - (half - 1)
    iu0c = jnp.clip(iu0, 0, npixel - support)
    iv0c = jnp.clip(iv0, 0, npixel - support)
    rel_u = (iu0c % tile).astype(jnp.float32)
    rel_v = (iv0c % tile).astype(jnp.float32)
    rot_ku = _rot8(_es_taps8(u_s, iu0c, support, beta, lo=u_lo), iu0c)
    rot_kv = _rot8(_es_taps8(v_s, iv0c, support, beta, lo=v_lo), iv0c)
    if taps_scale is not None:
        # per-entry factor (e.g. the ES w-kernel pair weight of an
        # eskernel-plan entry copy) folded into the stored taps: zero
        # runtime cost
        rot_ku = rot_ku * taps_scale.astype(jnp.float32)[None, :]
    head = jnp.stack([rel_u, rel_v, f_s, r3, r4, z, z, z])
    return jnp.concatenate([head, rot_ku, rot_kv])


def _grid_slot_kernel(
    slot_seg_ref,
    slot_col_ref,
    slot_first_ref,
    starts_ref,
    counts_ref,
    payload_ref,
    vals_ref,
    out_ref,
    *,
    buf: int,
    support: int,
    chunk: int,
    ntiles: int,
    ntile_axis: int,
    tile: int,
    nplanes_out: int,
    precision=None,
    use_taps: bool = False,
    beta: float | None = None,
    quad: bool = False,
):
    """One program per chunk-aligned slot of the sorted entry stream.

    The payload ([8, N] coordinate rows or the 24-row tap form, see
    ``_payload_stack``) and the [2, N] (vr, vi) value rows arrive as
    auto-pipelined [nrows, chunk] / [2, chunk] blocks. Keeping the
    values separate means the big geometry payload is never copied on a
    plan-reuse call — only the two 4-byte value rows change per call.
    Consecutive slots of the same segment map to the SAME output block
    index, so the [1, buf, 2*nplanes_out*buf] tile accumulator stays
    resident in VMEM across them (Mosaic only flushes on an index
    change); the segment's first slot initialises it. This pipelined
    slot structure is ~2x faster than a manual per-segment DMA walk —
    the measured bottleneck was per-iteration DMA issue/wait overhead
    on the scalar core, not bandwidth or compute.

    Output lane panels [re_lo | (re_hi |) im_lo (| im_hi)]: all plane
    products come out of ONE [buf, chunk] x [2*nplanes_out*buf, chunk]
    MXU contraction. The component panels ride the LANE axis (output
    [buf, 2*nplanes_out*buf]) rather than the sublane axis: MXU lane
    tiles are 128 wide, so an N of buf=72 wasted 44% of every pass
    while N = 4*buf = 288 wastes 25% (M is sublane-granular — any
    multiple of 8 is free).

    ``quad`` (w-stacked buf == 64 geometries, i.e. the t56 family):
    [2*buf, 2*buf] = [128, 128] quadrant layout — re/im on LHS rows,
    w-plane weights on RHS rows — filling BOTH MXU tile dimensions
    exactly (the [64, 256] form leaves the M half of every pass idle).
    Quadrants: rows [comp*buf + v], lanes [plane*buf + u].
    """
    i = pl.program_id(0)
    seg = slot_seg_ref[i]
    col = slot_col_ref[i]
    start = starts_ref[seg]
    count = counts_ref[seg]

    r = jax.lax.broadcasted_iota(jnp.int32, (buf, chunk), 0).astype(
        jnp.float32
    )
    gidx = col * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    valid = (gidx >= start) & (gidx < start + count)
    data = payload_ref[...]
    frac = jnp.where(valid, data[2][None, :], 0.0)
    # packed value rows: chunk col selects its (vr, vi) row pair
    m = col % 4
    vr_p = jnp.zeros((chunk,), jnp.float32)
    vi_p = jnp.zeros((chunk,), jnp.float32)
    for k in range(4):
        sel = jnp.where(m == k, 1.0, 0.0)
        vr_p = vr_p + sel * vals_ref[2 * k]
        vi_p = vi_p + sel * vals_ref[2 * k + 1]
    vr = jnp.where(valid, vr_p[None, :], 0.0)
    vi = jnp.where(valid, vi_p[None, :], 0.0)
    if use_taps:
        rel_u = data[0][None, :]
        rel_v = data[1][None, :]
        reps = buf // 8
        kv = jnp.concatenate([data[16:24]] * reps, axis=0)
        kv = jnp.where((r >= rel_v) & (r < rel_v + support), kv, 0.0)
        ku = jnp.concatenate([data[8:16]] * reps, axis=0)
        ku = jnp.where((r >= rel_u) & (r < rel_u + support), ku, 0.0)
    else:
        t = seg % ntiles
        tv0 = jnp.float32(0) + (t // ntile_axis * tile)
        tu0 = jnp.float32(0) + (t % ntile_axis * tile)
        b = 2.3 * support if beta is None else beta
        half = support / 2.0

        def es(offs):
            nu = offs / half
            nu2 = jnp.clip(nu * nu, 0.0, 1.0)
            k = jnp.exp(b * (jnp.sqrt(1.0 - nu2) - 1.0))
            return jnp.where(jnp.abs(nu) < 1.0, k, 0.0)

        # rows 5/6 hold the split-coordinate residuals (zero when
        # uncompensated): subtracting them AFTER the small difference
        # keeps full positional precision in f32. Difference FIRST:
        # (tv0 + r) - pix would round the intermediate at eps32 * npad
        # (the round-5 on-chip finding in the tiled path)
        kv = es((tv0 - data[1][None, :]) + r - data[6][None, :])
        ku = es((tu0 - data[0][None, :]) + r - data[5][None, :])
    dn = (((1,), (1,)), ((), ()))  # contract the chunk axis
    if nplanes_out == 1:
        rhs = jnp.concatenate([ku * vr, ku * vi], axis=0)
        contrib = _dot(kv, rhs, dn, precision)  # [buf, 2*buf]
    elif quad:
        # FULL-MXU quadrant layout (buf == 64 geometries): move the
        # re/im components onto the LHS rows and the w-plane weights
        # onto the RHS rows, so the contraction is [128, K] x [128, K]
        # -> [128, 128] — one exact MXU output tile per pass instead of
        # a [64, 256] result whose M dimension idles half the array.
        # out[a*buf+v, b*buf+u] = sum_e kv[v,e] val_a[e] ku[u,e] w_b[e]
        w0 = 1.0 - frac
        w1 = frac
        lhs = jnp.concatenate([kv * vr, kv * vi], axis=0)
        rhs = jnp.concatenate([ku * w0, ku * w1], axis=0)
        contrib = _dot(lhs, rhs, dn, precision)  # [2*buf, 2*buf]
    else:
        w0 = 1.0 - frac
        w1 = frac
        rhs = jnp.concatenate(
            [ku * (vr * w0), ku * (vr * w1), ku * (vi * w0), ku * (vi * w1)],
            axis=0,
        )
        contrib = _dot(kv, rhs, dn, precision)  # [buf, 4*buf]
    first = slot_first_ref[i] == 1

    @pl.when(first)
    def _():
        out_ref[0, :, :] = contrib

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[0, :, :] += contrib


def _grid_slots(starts, counts, *, nslots, ncols, nseg, chunk):
    """Map each chunk-aligned Pallas slot to (segment, payload column,
    is-first-slot). Like ``_degrid_slots`` but every segment gets at
    least one slot — its output block must be initialised even when
    empty — and unused tail slots alias the LAST segment (monotone
    output index) with the all-pad final column (zero contribution)."""
    acol = starts // chunk
    ecol = (starts + counts + chunk - 1) // chunk
    slot_counts = jnp.maximum(ecol - acol, 1)
    slot_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(slot_counts).astype(jnp.int32)]
    )
    sidx = jnp.arange(nslots, dtype=jnp.int32)
    slot_seg = (
        jnp.searchsorted(slot_offsets, sidx, side="right") - 1
    ).astype(jnp.int32)
    segc = jnp.clip(slot_seg, 0, nseg - 1)
    slot_col = acol[segc] + (sidx - slot_offsets[segc])
    slot_first = (sidx == slot_offsets[segc]).astype(jnp.int32)
    live = sidx < slot_offsets[-1]
    slot_col = jnp.where(live, jnp.clip(slot_col, 0, ncols - 1), ncols - 1)
    slot_seg = jnp.where(live, segc, nseg - 1)
    slot_first = jnp.where(live, slot_first, 0)
    return slot_seg, slot_col, slot_first


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
        "beta",
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
    matmul_precision: str | None = "config",
    beta: float | None = None,
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
    npad = _pad_stream(n, chunk)
    pz = jnp.zeros((npad,), jnp.float32)
    u_s = jnp.concatenate([u_s, pz])
    v_s = jnp.concatenate([v_s, pz])
    f_s = jnp.concatenate([f_s, pz])
    vr_s = jnp.concatenate([vr_s, pz])
    vi_s = jnp.concatenate([vi_s, pz])
    vals = _value_rows(vr_s, vi_s, chunk)
    z = jnp.zeros_like(u_s)
    payload = _payload_stack(
        u_s, v_s, f_s, z, z,
        npixel=npixel, support=support, tile=ts, beta=beta,
    )

    from .gridding_tiled import sorted_seg_bounds

    starts, counts = sorted_seg_bounds(seg_s, nseg)
    nslots = n // chunk + nseg + 3
    slot_seg, slot_col, slot_first = _grid_slots(
        starts, counts, nslots=nslots,
        ncols=payload.shape[1] // chunk, nseg=nseg, chunk=chunk,
    )
    grids = _grid_execute(
        starts,
        counts,
        slot_seg,
        slot_col,
        slot_first,
        payload,
        vals,
        npixel=npixel,
        support=support,
        nplanes=nplanes,
        nseg_planes=nseg_planes,
        nplanes_out=nplanes_out,
        wstacked=wstacked,
        tile=ts,
        chunk=chunk,
        interpret=interpret,
        precision=_cfg_precision(matmul_precision),
        beta=beta,
    )
    if squeeze:
        return grids[0]
    return grids


def _grid_execute(
    starts,
    counts,
    slot_seg,
    slot_col,
    slot_first,
    payload,
    vals,
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
    beta: float | None = None,
):
    """Pallas slot kernel + plane combine + overlap-add assemble over a
    prepared (sorted) payload stream and its [2, Npad] (vr, vi) value
    rows. Shared by :func:`fused_grid_wstack` and the plan path
    (gridding_plan.py)."""
    ts = tile
    buf = ts + support
    ntile_axis = npixel // ts
    ntiles = ntile_axis * ntile_axis
    nseg = ntiles * nseg_planes
    nrows = payload.shape[0]
    nslots = slot_seg.shape[0]
    # full-MXU quadrant layout for the w-stacked buf=64 (t56) family
    quad = nplanes_out == 2 and buf == 64
    acc_shape = (
        (nseg, 2 * buf, 2 * buf)
        if quad
        else (nseg, buf, 2 * nplanes_out * buf)
    )

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
            (1,) + acc_shape[1:],
            lambda i, sg, sc, fi, st, ct: (sg[i], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = partial(
        _grid_slot_kernel,
        buf=buf,
        support=support,
        chunk=chunk,
        ntiles=ntiles,
        ntile_axis=ntile_axis,
        tile=ts,
        nplanes_out=nplanes_out,
        precision=precision,
        use_taps=nrows == 24,
        beta=beta,
        quad=quad,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct(acc_shape, jnp.float32),
    )(slot_seg, slot_col, slot_first, starts, counts, payload, vals)

    if use_tap_payload(support, tile) and (
        ntile_axis % _assemble_group(tile, ntile_axis) == 0
    ):
        return _assemble_execute(
            out,
            nseg_planes=nseg_planes,
            nplanes_out=nplanes_out,
            wstacked=wstacked,
            npixel=npixel,
            tile=ts,
            support=support,
            interpret=interpret,
            quad=quad,
        )

    if wstacked:
        if quad:
            # quadrant layout: rows [comp*buf + v], lanes [plane*buf + u]
            o4 = out.reshape(nseg_planes, ntiles, 2, buf, 2, buf)
            o = jnp.stack(
                [
                    o4[:, :, 0, :, 0, :],  # re_lo
                    o4[:, :, 0, :, 1, :],  # re_hi
                    o4[:, :, 1, :, 0, :],  # im_lo
                    o4[:, :, 1, :, 1, :],  # im_hi
                ],
                axis=2,
            )
        else:
            # lane panels [re_lo | re_hi | im_lo | im_hi]; combine
            # lower/upper halves into per-plane tile stacks: plane p
            # receives seg (p, :) lower halves and seg (p-1, :) uppers
            o = out.reshape(nseg_planes, ntiles, buf, 4, buf).transpose(
                0, 1, 3, 2, 4
            )
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
        acc = jax.lax.complex(out[:, :, :buf], out[:, :, buf:])
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


def _assemble_group(tile: int, ntile_axis: int) -> int:
    """Tiles assembled per program along u. Mosaic requires the output
    block's lane dim to be DIVISIBLE by 128 (not merely >= 128) or
    equal to the full array dim, so the group is the minimal g with
    tile*g % 128 == 0 that divides the tile row — else a full row per
    program (lane dim == array dim, always legal; the u-halo wrap adds
    only zero columns because entries are clipped in-grid)."""
    import math

    g = max(2, 128 // math.gcd(tile, 128))
    if g <= ntile_axis and ntile_axis % g == 0:
        return g
    return ntile_axis


def _assemble_execute(
    out,
    *,
    nseg_planes: int,
    nplanes_out: int,
    wstacked: bool,
    npixel: int,
    tile: int,
    support: int,
    interpret: bool,
    quad: bool = False,
):
    """Single-pass Pallas overlap-add: raw per-segment tile accumulators
    [nseg, buf, 2*nplanes_out*buf] -> assembled complex plane grids.

    Replaces the XLA combine/roll/transpose chain (which re-lays-out the
    full grid volume several times, ~28 ms at the BASELINE config) with
    one program per (plane, tile) that reads its own [ts, ts] core plus
    the right/bottom/corner halo strips of its left/upper neighbours
    (block-aligned because support == 8 and tile % 8 == 0). Wrap-around
    neighbour indices are safe: edge halos are provably zero because
    out-of-grid visibilities are weight-masked. For w-stacked grids,
    plane p sums the lower-plane accumulator of segment-plane p and the
    upper-plane accumulator of segment-plane p-1, masked at the ends.

    Component panels ride the LANE axis of the accumulators (see
    ``_grid_slot_kernel``), at offsets k*buf that are not 128-aligned;
    Mosaic cannot slice at arbitrary lane offsets, so panels are brought
    to lane 0 with ``pltpu.roll`` (cheap VPU lane rotation) and the
    8-wide halo strips are placed with exact one-hot f32 contractions.
    """
    ts = tile
    buf = ts + support
    nta = npixel // ts
    g = _assemble_group(ts, nta)
    ntag = nta // g
    ntiles = nta * nta
    ntiles_g = ntiles // g
    sources = ("lo", "hi") if wstacked else ("lo",)
    nl = out.shape[2]  # 2*nplanes_out*buf (or 2*buf in quad layout)
    nr = out.shape[1]  # buf (or 2*buf in quad layout)
    # (row offset, lane offset) of each (source, component) panel:
    # classic layout rides the lanes in buf-wide panels; the quad layout
    # (see _grid_slot_kernel) is a 2x2 block matrix rows=[re|im],
    # lanes=[lo|hi]
    if quad:
        rb = {("lo", "re"): (0, 0), ("hi", "re"): (0, buf),
              ("lo", "im"): (buf, 0), ("hi", "im"): (buf, buf)}
    elif nplanes_out == 2:
        rb = {("lo", "re"): (0, 0), ("hi", "re"): (0, buf),
              ("lo", "im"): (0, 2 * buf), ("hi", "im"): (0, 3 * buf)}
    else:
        rb = {("lo", "re"): (0, 0), ("lo", "im"): (0, buf)}

    # u-adjacent segments are contiguous in the accumulator stack, so the
    # stack reshapes (bitcast, no copy) into pairs. One program per
    # (segment-plane, tv, tile-pair) assembles BOTH the lower- and
    # upper-plane panels from ONE fetch set (the w-plane shift-add happens
    # in XLA afterwards, so lo/hi no longer trigger duplicate fetches),
    # and the up/up-left neighbours are fetched as 8-row halo STRIPS
    # (blocks (·,·,8,nl) at row-block ts//8) while the left neighbour
    # fetches only its second pair element: 368 KB/program instead of the
    # previous full-pair scheme's 884 KB/source — the assemble stage is
    # DMA-bound (measured 6.6 ms of a 24.9 ms grid call at the 10M-vis
    # BASELINE before this restructuring).
    out_groups = out.reshape(ntiles_g * nseg_planes, g, nr, nl)

    def group_of(p, tv, tj, dv, dj):
        return (
            p * ntiles_g
            + ((tv + dv + nta) % nta) * ntag
            + ((tj + dj + ntag) % ntag)
        )

    in_specs = [
        # self group (all g elements, full)
        pl.BlockSpec(
            (1, g, nr, nl),
            lambda p, tv, tj: (group_of(p, tv, tj, 0, 0), 0, 0, 0),
        ),
        # left-neighbour group, last element only (right-halo source)
        pl.BlockSpec(
            (1, 1, nr, nl),
            lambda p, tv, tj: (group_of(p, tv, tj, 0, -1), g - 1, 0, 0),
        ),
        # upper-neighbour group, bottom 8-row strip (re rows)
        pl.BlockSpec(
            (1, g, 8, nl),
            lambda p, tv, tj: (group_of(p, tv, tj, -1, 0), 0, ts // 8, 0),
        ),
        # upper-left group, last element bottom strip (corner halo)
        pl.BlockSpec(
            (1, 1, 8, nl),
            lambda p, tv, tj: (group_of(p, tv, tj, -1, -1), g - 1,
                               ts // 8, 0),
        ),
    ]
    if quad:
        # the quad layout's im rows live at [buf, 2*buf): their bottom
        # strips are a second, non-contiguous fetch pair
        in_specs += [
            pl.BlockSpec(
                (1, g, 8, nl),
                lambda p, tv, tj: (
                    group_of(p, tv, tj, -1, 0), 0, (buf + ts) // 8, 0,
                ),
            ),
            pl.BlockSpec(
                (1, 1, 8, nl),
                lambda p, tv, tj: (
                    group_of(p, tv, tj, -1, -1), g - 1, (buf + ts) // 8, 0,
                ),
            ),
        ]

    def kernel(selfb, prevb, upb, upprevb, *rest):
        if quad:
            upb_im, upprevb_im = rest[0], rest[1]
            outs = rest[2:]
        else:
            upb_im, upprevb_im = upb, upprevb
            outs = rest
        # 8-wide halo placement via exact one-hot contractions: a 0/1
        # matrix at HIGHEST precision reproduces the selected f32 values
        # exactly
        i2 = jax.lax.broadcasted_iota(jnp.int32, (ts, 8), 0)
        j2 = jax.lax.broadcasted_iota(jnp.int32, (ts, 8), 1)
        p8 = jnp.where(i2 == j2, 1.0, 0.0).astype(
            jnp.float32
        )  # [ts, 8] identity in the first 8 rows

        def place_cols(x):  # [r, 8] -> [r, ts]: halo col j -> col j
            return jax.lax.dot_general(
                x, p8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision="highest",
            )

        def place_rows(x):  # [8, ts] -> [ts, ts]: halo row j -> row j
            return jax.lax.dot_general(
                p8, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision="highest",
            )

        def shift(x, off, w):
            """Lanes [off, off+w) of x brought to lane 0 (roll), sliced."""
            if off:
                x = pltpu.roll(x, nl - off, 1)
            return x[:, :w]

        def gather(r0, c0, t, upref, upprevref):
            """Assembled [ts, ts] core of group element t for the panel
            at (row offset r0, lane offset c0)."""
            core = shift(selfb[0, t, r0:r0 + ts, :], c0, ts)
            left = shift(
                selfb[0, t - 1, r0:r0 + ts, :]
                if t
                else prevb[0, 0, r0:r0 + ts, :],
                c0 + ts, 8,
            )  # [ts, 8] right-halo cols of the left neighbour
            up = shift(upref[0, t, :, :], c0, ts)
            cor = shift(
                upref[0, t - 1, :, :] if t else upprevref[0, 0, :, :],
                c0 + ts, 8,
            )  # [8, 8] corner halo
            return (
                core
                + place_cols(left)
                + place_rows(up)
                + place_rows(place_cols(cor))
            )

        for t in range(g):
            for si, src in enumerate(sources):
                out_r, out_i = outs[2 * si], outs[2 * si + 1]
                r0, c0 = rb[(src, "re")]
                out_r[0, :, t * ts:(t + 1) * ts] = gather(
                    r0, c0, t, upb, upprevb
                )
                r0, c0 = rb[(src, "im")]
                out_i[0, :, t * ts:(t + 1) * ts] = gather(
                    r0, c0, t, upb_im, upprevb_im
                )

    o_spec = pl.BlockSpec((1, ts, g * ts), lambda p, tv, tj: (p, tv, tj))
    o_shape = jax.ShapeDtypeStruct(
        (nseg_planes, npixel, npixel), jnp.float32
    )
    nsrc = len(sources)
    outs = pl.pallas_call(
        kernel,
        grid=(nseg_planes, nta, ntag),
        in_specs=in_specs,
        out_specs=(o_spec,) * (2 * nsrc),
        out_shape=(o_shape,) * (2 * nsrc),
        interpret=interpret,
    )(*([out_groups] * len(in_specs)))
    lo = jax.lax.complex(outs[0], outs[1])
    if not wstacked:
        return lo
    # w-plane shift-add: plane p = lo[p] + hi[p-1] (ends single-sided)
    hi = jax.lax.complex(outs[2], outs[3])
    zp = jnp.zeros((1, npixel, npixel), lo.dtype)
    return jnp.concatenate([lo, zp]) + jnp.concatenate([zp, hi])


# ---------------------------------------------------------------------------
# fused degrid (predict): adjoint of the fused gridder
# ---------------------------------------------------------------------------


def _degrid_kernel(
    slot_seg_ref,
    slot_col_ref,
    slot_first_ref,
    seg_starts_ref,
    seg_counts_ref,
    payload_ref,
    tlo_r_ref,
    tlo_i_ref,
    thi_r_ref,
    thi_i_ref,
    out_r_ref,
    out_i_ref,
    *,
    buf: int,
    support: int,
    chunk: int,
    ntiles: int,
    ntile_axis: int,
    tile: int,
    nseg: int,
    wstacked: bool,
    precision=None,
    use_taps: bool = False,
    beta: float | None = None,
):
    """One program per chunk-aligned slot of the sorted entry stream.

    All inputs are block-spec'd (auto-pipelined): payload [8, chunk] chunk
    column, and the [1, buf, buf] lower/upper plane tiles selected by the
    prefetched slot->segment map. The output block is indexed by PAYLOAD
    COLUMN, not slot: each program masks its lanes to its own segment's
    [start, start+count) range and slots sharing a boundary column
    accumulate into the same resident block (slot columns are monotone, so
    Mosaic keeps the block in VMEM across the run; the column's first slot
    initialises it). The result is the compacted sorted-order value stream
    directly — no per-entry back-sort pass.
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

    if beta is None:
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
    frac = jnp.where(live, data[2][None, :], 0.0)

    if use_taps:
        rel_u = data[0][None, :]
        rel_v = data[1][None, :]
        reps = buf // 8
        kv = jnp.concatenate([data[16:24]] * reps, axis=0)
        kv = jnp.where((r >= rel_v) & (r < rel_v + support), kv, 0.0)
        ku = jnp.concatenate([data[8:16]] * reps, axis=0)
        ku = jnp.where((r >= rel_u) & (r < rel_u + support), ku, 0.0)
    else:
        uu = data[0][None, :]
        vv = data[1][None, :]

        def es(offs):
            nu = offs / half
            nu2 = jnp.clip(nu * nu, 0.0, 1.0)
            k = jnp.exp(beta * (jnp.sqrt(1.0 - nu2) - 1.0))
            return jnp.where(jnp.abs(nu) < 1.0, k, 0.0)

        # rows 5/6: split-coordinate residuals (zero when uncompensated);
        # difference first (no eps32*npad intermediate, round 5)
        kv = es((tv0 - vv) + r - data[6][None, :])  # [buf, chunk]
        ku = es((tu0 - uu) + r - data[5][None, :])
    livef = jnp.where(live, 1.0, 0.0)

    # val[c] = sum_x ( sum_r T[r, x] kv[r, c] ) ku[x, c]
    dn = (((0,), (0,)), ((), ()))  # contract r -> [x, c]

    def tile_vals(t_ref):
        a = _dot(t_ref[0], kv, dn, precision)
        return jnp.sum(a * ku, axis=0, keepdims=True)  # [1, chunk]

    if wstacked and buf == 64:
        # full-MXU form (t56 family): concat the lower/upper plane
        # tiles along the output axis so each contraction is
        # [64, 128]^T x [64, chunk] -> [128, chunk] — M exactly fills
        # the MXU where the four separate [64, chunk] results idled
        # half of every pass (2 full passes instead of 4 half-filled)
        w0 = (1.0 - frac) * livef
        w1 = frac * livef
        tr2 = jnp.concatenate([tlo_r_ref[0], thi_r_ref[0]], axis=1)
        ti2 = jnp.concatenate([tlo_i_ref[0], thi_i_ref[0]], axis=1)
        ar = _dot(tr2, kv, dn, precision)  # [2*buf, chunk]
        ai = _dot(ti2, kv, dn, precision)
        vr = (
            jnp.sum(ar[0:buf] * ku, axis=0, keepdims=True) * w0
            + jnp.sum(ar[buf:2 * buf] * ku, axis=0, keepdims=True) * w1
        )
        vi = (
            jnp.sum(ai[0:buf] * ku, axis=0, keepdims=True) * w0
            + jnp.sum(ai[buf:2 * buf] * ku, axis=0, keepdims=True) * w1
        )
    elif wstacked:
        w0 = (1.0 - frac) * livef
        w1 = frac * livef
        vr = tile_vals(tlo_r_ref) * w0 + tile_vals(thi_r_ref) * w1
        vi = tile_vals(tlo_i_ref) * w0 + tile_vals(thi_i_ref) * w1
    else:
        vr = tile_vals(tlo_r_ref) * livef
        vi = tile_vals(tlo_i_ref) * livef
    first = slot_first_ref[i] == 1

    @pl.when(first)
    def _():
        out_r_ref[...] = vr
        out_i_ref[...] = vi

    @pl.when(jnp.logical_not(first))
    def _():
        out_r_ref[...] += vr
        out_i_ref[...] += vi


@partial(
    jax.jit,
    static_argnames=(
        "support",
        "nplanes",
        "tile",
        "chunk",
        "interpret",
        "matmul_precision",
        "beta",
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
    matmul_precision: str | None = "config",
    beta: float | None = None,
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
    payload = _payload_stack(
        u_s, v_s, f_s, ib_s, z, npixel=npixel, support=support, tile=ts,
        beta=beta,
    )

    # segment bounds INCLUDING the trash segment (out-of-grid entries must
    # still return their pass-through index for the back-sort)
    from .gridding_tiled import sorted_seg_bounds

    starts_p, counts_p = sorted_seg_bounds(seg_s, nseg + 1)
    nslots = n // chunk + nseg + 3
    ncols = payload.shape[1] // chunk
    slot_seg, slot_col, slot_first = _degrid_slots(
        starts_p, counts_p, nslots=nslots, ncols=ncols, nseg=nseg,
        chunk=chunk,
    )
    vr_o, vi_o = _degrid_execute(
        slot_seg,
        slot_col,
        slot_first,
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
        precision=_cfg_precision(matmul_precision),
        beta=beta,
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
    # first slot owning each column (initialises the output block; later
    # same-column slots accumulate)
    prev_col = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), slot_col[:-1]]
    )
    slot_first = (slot_col != prev_col).astype(jnp.int32)
    return slot_seg, slot_col, slot_first


def _degrid_execute(
    slot_seg,
    slot_col,
    slot_first,
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
    key_row: int | None = 3,
    precision=None,
    beta: float | None = None,
):
    """Pallas degrid kernel over prepared slot maps. Shared by
    :func:`fused_degrid_wstack` and the plan path (gridding_plan.py).

    The kernel emits the compacted sorted-order value stream directly
    (slot rows accumulate into their payload column). ``key_row=None``
    returns it as-is (zero sorts — the plan sorted-domain fast path);
    otherwise one 3-operand sort keyed by the f32-bitcast i32 indices in
    ``payload[key_row]`` restores that ordering. Returns (vr, vi) [n]."""
    ts = tile
    buf = ts + support
    ntile_axis = npixel // ts
    ntiles = ntile_axis * ntile_axis
    nrows = payload.shape[0]
    ncols = payload.shape[1] // chunk

    tiles = jax.vmap(lambda g: _extract_tiles_f(g, ts, support))(grids)
    tiles = tiles.reshape(nplanes * ntiles, buf, buf)
    tiles_r = jnp.real(tiles)
    tiles_i = jnp.imag(tiles)

    def lo_map(i, ss, sc, fi, st, ct):
        return (jnp.minimum(ss[i], nseg - 1), 0, 0)

    def hi_map(i, ss, sc, fi, st, ct):
        return (jnp.minimum(ss[i], nseg - 1) + (ntiles if wstacked else 0),
                0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nslots,),
        in_specs=[
            pl.BlockSpec(
                (nrows, chunk), lambda i, ss, sc, fi, st, ct: (0, sc[i]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, buf, buf), lo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, buf, buf), lo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, buf, buf), hi_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, buf, buf), hi_map, memory_space=pltpu.VMEM),
        ],
        # [1, ncols*chunk] row layout: Mosaic requires the block's
        # second-to-last dim be 8-divisible or equal the array dim
        out_specs=(
            pl.BlockSpec(
                (1, chunk), lambda i, ss, sc, fi, st, ct: (0, sc[i]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, chunk), lambda i, ss, sc, fi, st, ct: (0, sc[i]),
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
        wstacked=wstacked,
        precision=precision,
        use_taps=nrows == 24,
        beta=beta,
    )
    out_r, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=(
            jax.ShapeDtypeStruct((1, ncols * chunk), jnp.float32),
            jax.ShapeDtypeStruct((1, ncols * chunk), jnp.float32),
        ),
    )(slot_seg, slot_col, slot_first, starts_p, counts_p, payload,
      tiles_r, tiles_i, tiles_r, tiles_i)

    vr_s = out_r.reshape(-1)[:n]
    vi_s = out_i.reshape(-1)[:n]
    if key_row is None:
        return vr_s, vi_s
    key = jax.lax.bitcast_convert_type(payload[key_row, :n], jnp.int32)
    _, vr_o, vi_o = jax.lax.sort((key, vr_s, vi_s), num_keys=1)
    return vr_o, vi_o


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
