"""Pallas TPU kernels for Beneš fixed-permutation application.

The XLA path (:func:`ops.permute.benes_apply`) pays one global memory
pass per butterfly stage — 2n-1 passes (~47 at N=2^24). Here the stages
are regrouped into THREE bandwidth passes using the network's locality:

* stages with butterfly distance >= 2^K move data only between positions
  sharing their low K index bits ("column" pass over the top n-K bits);
* stages with distance < 2^K move data only WITHIN aligned 2^K-element
  blocks (VMEM-resident pass: a block is loaded once and all middle
  stages run on it in VMEM).

With K = 17 (512 KB f32 blocks) any n <= K + 8 = 25 needs at most
opening-column + middle-block + closing-column = 3 passes, so the apply
is HBM-bandwidth-bound and independent of n — the design target that
beats the ~33 ms lax.sort floor by ~10x at N=10M.

Butterflies never index: a stage is ``where(bit, partner, x)`` where the
partner view is built from two cyclic rolls selected by an iota parity
mask (`pltpu.roll` along sublanes for row distances, along lanes for
sub-128 distances). Control bits stream in the same blocked layout as the
payload (per-element bytes, 8 stages per byte — see ops/permute.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - import guard mirrors gridding_fused.py
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from .permute import BenesPlan, _stage_k

__all__ = ["benes_apply_tpu"]

_K = 17  # middle-block log2: 2^17 elements = 512 KB f32 per block


def _butterfly(x, bit, d, axis):
    """y = where(bit, x[partner], x) with partner = index ^ d along
    ``axis`` — built from two rolls + parity select (no gathers)."""
    dim = x.shape[axis]
    fwd = pltpu.roll(x, dim - d, axis)  # [i] <- x[i + d] (shifts >= 0)
    bwd = pltpu.roll(x, d, axis)  # [i] <- x[i - d]
    par = (
        jax.lax.broadcasted_iota(jnp.int32, x.shape, axis) & d
    ) == 0
    partner = jnp.where(par, fwd, bwd)
    return jnp.where(bit != 0, partner, x)


def _mid_kernel(stages, n, ngroups, *refs):
    # refs: ctrl group refs (ngroups), x ref, out ref; blocks
    # [1, rows, 128] with rows = 2^(K-7)
    ctrl = refs[:ngroups]
    x_ref, o_ref = refs[ngroups], refs[ngroups + 1]
    x = x_ref[0]
    # int32 AND-mask bit tests: Mosaic does not legalize vector uint8
    # shifts (arith.shrui), so widen once and mask per stage
    c32 = {g: ctrl[g][0].astype(jnp.int32) for g in {s >> 3 for s in stages}}
    for s in stages:
        k = _stage_k(s, n)
        bit = c32[s >> 3] & (1 << (s & 7))
        if k >= 7:
            x = _butterfly(x, bit, 1 << (k - 7), 0)
        else:
            x = _butterfly(x, bit, 1 << k, 1)
    o_ref[0] = x


def _col_kernel(stages, n, ngroups, *refs):
    # blocks [B, C]: butterflies along axis 0 (the top n-K bits)
    ctrl = refs[:ngroups]
    x_ref, o_ref = refs[ngroups], refs[ngroups + 1]
    x = x_ref[...]
    c32 = {
        g: ctrl[g][...].astype(jnp.int32) for g in {s >> 3 for s in stages}
    }
    for s in stages:
        k = _stage_k(s, n)
        bit = c32[s >> 3] & (1 << (s & 7))
        x = _butterfly(x, bit, 1 << (k - _K), 0)
    o_ref[...] = x


def _run_mid(x3, groups3, stages, n, interpret):
    """x3: [nblk, rows, 128] f32; groups3: ctrl tuple, same shape uint8."""
    nblk, rows, _ = x3.shape
    kern = partial(_mid_kernel, tuple(stages), n, len(groups3))
    spec = pl.BlockSpec((1, rows, 128), lambda b: (b, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[spec] * (len(groups3) + 1),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        interpret=interpret,
    )(*groups3, x3)


def _run_col(xb, groupsb, stages, n, interpret):
    """xb: [B, 2^K] f32 (top-bits-major); butterflies along axis 0."""
    B, L = xb.shape
    C = min(2048, L)
    nj = L // C
    kern = partial(_col_kernel, tuple(stages), n, len(groupsb))
    spec = pl.BlockSpec((B, C), lambda j: (0, j))
    return pl.pallas_call(
        kern,
        grid=(nj,),
        in_specs=[spec] * (len(groupsb) + 1),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(xb.shape, xb.dtype),
        interpret=interpret,
    )(*groupsb, xb)


def _ctrl_tuple(g_blocked, stages):
    """Dense ctrl tuple indexable by ``s >> 3`` for the given stages
    (unused low slots are filled with group 0 and never read)."""
    gids = sorted({s >> 3 for s in stages})
    return tuple(g_blocked[g] for g in range(max(gids) + 1))


@partial(jax.jit, static_argnames=("inverse", "interpret"))
def benes_apply_tpu(
    plan: BenesPlan, *payloads, inverse: bool = False,
    interpret: bool | None = None,
):
    """3-pass Pallas Beneš apply (gather order; ``inverse`` scatters).

    Semantically identical to :func:`ops.permute.benes_apply` (bit-exact:
    pure data movement). Payloads must be float32/complex64 (complex
    split internally). Requires n <= 25; callers fall back to the XLA
    path beyond that.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, N, size = plan.n, 1 << plan.n, plan.size
    if n > _K + 8:
        raise ValueError(f"benes_apply_tpu supports n <= {_K + 8}")
    if n < 10:
        raise ValueError("benes_apply_tpu needs n >= 10; use benes_apply")
    allst = list(range(plan.nstages))
    if n <= _K:
        opening, middle, closing = [], allst, []
    else:
        opening = [s for s in allst if s < n and _stage_k(s, n) >= _K]
        middle = [s for s in allst if _stage_k(s, n) < _K]
        closing = [s for s in allst if s >= n and _stage_k(s, n) >= _K]
    if inverse:
        passes = [
            (list(reversed(closing)), "col"),
            (list(reversed(middle)), "mid"),
            (list(reversed(opening)), "col"),
        ]
    else:
        passes = [(opening, "col"), (middle, "mid"), (closing, "col")]
    passes = [p for p in passes if p[0]]

    blk = min(N, 1 << _K)
    nblk = N // blk
    rows = blk // 128
    g2 = tuple(g.reshape(nblk, blk) for g in plan.groups)
    g3 = tuple(g.reshape(nblk, rows, 128) for g in plan.groups)

    def run(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.complexfloating):
            re, im = run(jnp.real(x)), run(jnp.imag(x))
            return jax.lax.complex(re, im).astype(x.dtype)
        xp = jnp.pad(x, (0, N - size)) if size != N else x
        for stages, kind in passes:
            if kind == "mid":
                x3 = xp.reshape(nblk, rows, 128)
                x3 = _run_mid(
                    x3, _ctrl_tuple(g3, stages), stages, n, interpret
                )
                xp = x3.reshape(N)
            else:
                xb = xp.reshape(nblk, blk)
                xb = _run_col(
                    xb, _ctrl_tuple(g2, stages), stages, n, interpret
                )
                xp = xb.reshape(N)
        return xp[:size] if size != N else xp

    res = tuple(run(p) for p in payloads)
    return res[0] if len(res) == 1 else res
