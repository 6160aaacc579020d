"""Gain application and gaintable algebra (framework L3, C2/C4).

Re-design of /root/reference/src/ska_sdp_func_python/calibration/operations.py
and calibration/jones.py: the reference applies gains with per-row/baseline/
channel python triple loops (operations.py:109-242); here every path is one
batched einsum over [time, baseline, channel], with closed-form 2x2 inverses
and where-masked singular-gain handling.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.gaintable import GainTable
from ..models.visibility import Visibility

__all__ = [
    "apply_gaintable",
    "apply_jones",
    "multiply_gaintables",
    "concatenate_gaintables",
]


def _inv2x2(m, min_det: float = 0.0):
    """Closed-form batched 2x2 inverse; returns (inv, invertible mask).

    Replaces the reference's per-antenna numpy.linalg.inv try/except
    (operations.py:131-139) with a det guard.
    """
    a = m[..., 0, 0]
    b = m[..., 0, 1]
    c = m[..., 1, 0]
    d = m[..., 1, 1]
    det = a * d - b * c
    ok = jnp.abs(det) > min_det
    safe = jnp.where(ok, det, 1.0)
    inv = (
        jnp.stack(
            [
                jnp.stack([d, -b], axis=-1),
                jnp.stack([-c, a], axis=-1),
            ],
            axis=-2,
        )
        / safe[..., None, None]
    )
    return jnp.where(ok[..., None, None], inv, 0.0), ok


def _gain_row_of_time(vis_time, gt_time, gt_interval):
    """Map each vis time to its gaintable row: |t - t_row| < interval/2
    (operations.py:58-63). Returns (row_idx [ntime], has_row [ntime])."""
    d = jnp.abs(vis_time[None, :] - gt_time[:, None])
    member = d < (gt_interval[:, None] / 2.0)
    has_row = jnp.any(member, axis=0)
    row_idx = jnp.argmax(member, axis=0)
    return row_idx, has_row


def apply_gaintable(
    vis: Visibility, gt: GainTable, inverse: bool = False, use_flags: bool = False
) -> Visibility:
    """Apply (or invert) gaintable: V' = g_i V g_j^H (operations.py:23-256).

    npol==1: scalar product; npol==2: diagonal coherency through full Jones;
    npol==4: full 2x2 congruence. Singular gains under ``inverse`` zero the
    corresponding visibilities and weights.
    """
    row_idx, has_row = _gain_row_of_time(vis.time, gt.time, gt.interval)
    gain_t = gt.gain[row_idx]  # [ntime, nants, nchan_gt, nrec, nrec]
    # broadcast single-channel gaintables across vis channels
    if gt.nchan == 1 and vis.nchan > 1:
        gain_t = jnp.broadcast_to(
            gain_t,
            (gain_t.shape[0], gain_t.shape[1], vis.nchan) + gain_t.shape[3:],
        )
    a1 = vis.antenna1
    a2 = vis.antenna2
    g1 = gain_t[:, a1]  # [ntime, nbl, nchan, nrec, nrec]
    g2 = gain_t[:, a2]

    original = vis.flagged_vis if use_flags else vis.vis
    weight = vis.flagged_weight if use_flags else vis.weight

    if vis.npol == 1:
        lg1 = g1[..., 0, 0]
        lg2 = g2[..., 0, 0]
        if inverse:
            ok1 = jnp.abs(lg1) > 0.0
            ok2 = jnp.abs(lg2) > 0.0
            lg1 = jnp.where(ok1, 1.0 / jnp.where(ok1, lg1, 1.0), 0.0)
            lg2 = jnp.where(ok2, 1.0 / jnp.where(ok2, lg2, 1.0), 0.0)
        smueller = lg1 * jnp.conj(lg2)  # [ntime, nbl, nchan]
        okm = (jnp.abs(smueller) > 0.0)[..., None]
        applied = jnp.where(okm, original * smueller[..., None], 0.0)
        new_wt = jnp.where(okm, weight, 0.0)
    elif vis.npol in (2, 4):
        if inverse:
            g1, ok1 = _inv2x2(g1)
            g2, ok2 = _inv2x2(g2)
            okm = (ok1 & ok2)[..., None]
        else:
            okm = jnp.ones(original.shape[:-1] + (1,), dtype=bool)
        if vis.npol == 2:
            # V' = diag(G1 @ diag(V) @ G2^H) (operations.py:148-185)
            applied = jnp.einsum(
                "...pq,...q,...pq->...p", g1, original, jnp.conj(g2)
            )
        else:
            v22 = original.reshape(original.shape[:-1] + (2, 2))
            a22 = jnp.einsum(
                "...pr,...rs,...qs->...pq", g1, v22, jnp.conj(g2)
            )
            applied = a22.reshape(original.shape)
        applied = jnp.where(okm, applied, 0.0)
        new_wt = jnp.where(okm, weight, 0.0)
    else:
        raise ValueError(f"Unsupported npol {vis.npol}")

    keep = has_row[:, None, None, None]
    return vis.replace(
        vis=jnp.where(keep, applied, vis.vis),
        weight=jnp.where(keep, new_wt, vis.weight),
    )


def apply_jones(ej, cfs, inverse: bool = False, min_det: float = 1e-6):
    """Apply Jones matrix: ej @ cfs @ ej^H, or its inverse with a
    determinant guard (calibration/jones.py:8-27). Batched over leading axes.
    """
    ej = jnp.asarray(ej)
    cfs = jnp.asarray(cfs)
    if inverse:
        inv, ok = _inv2x2(ej, min_det=min_det)
        out = jnp.einsum(
            "...pr,...rs,...qs->...pq", inv, cfs, jnp.conj(inv)
        )
        return jnp.where(ok[..., None, None], out, cfs)
    return jnp.einsum("...pr,...rs,...qs->...pq", ej, cfs, jnp.conj(ej))


def multiply_gaintables(
    gt: GainTable, dgt: GainTable, time_tolerance: float = 1e-3
) -> GainTable:
    """gt * dgt (operations.py:259-299)."""
    if gt.nrec == dgt.nrec == 2:
        gain = jnp.einsum("...ik,...ij->...kj", gt.gain, dgt.gain)
    elif gt.nrec == dgt.nrec == 1:
        gain = gt.gain * dgt.gain
    else:
        raise ValueError("Gain tables have different structures")
    return gt.replace(gain=gain, weight=gt.weight * dgt.weight)


def concatenate_gaintables(gt_list) -> GainTable:
    """Concatenate along time (operations.py:302-320)."""
    if not gt_list:
        raise ValueError("GainTable list is empty")
    g0 = gt_list[0]
    return g0.replace(
        gain=jnp.concatenate([g.gain for g in gt_list], axis=0),
        weight=jnp.concatenate([g.weight for g in gt_list], axis=0),
        residual=jnp.concatenate([g.residual for g in gt_list], axis=0),
        time=jnp.concatenate([g.time for g in gt_list], axis=0),
        interval=jnp.concatenate([g.interval for g in gt_list], axis=0),
    )
