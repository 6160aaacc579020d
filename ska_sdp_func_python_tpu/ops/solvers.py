"""Antenna gain solver (framework L2/L3, C1): batched StefCal-style iterative
substitution, TPU-native.

Re-design of /root/reference/src/ska_sdp_func_python/calibration/solvers.py:
the reference loops over gaintable rows in python (solvers.py:84) and runs a
per-row numpy iteration (solvers.py:259-273). Here:

* the baseline->antenna-pair normal-equation build is one masked einsum +
  scatter (MXU/VPU friendly, psum-able across baseline shards);
* all solution intervals and channels are solved *simultaneously* — the
  iteration is a single ``lax.while_loop`` whose state carries every
  interval, with per-interval convergence masking (converged intervals
  freeze while stragglers iterate);
* update ordering, damping, reference-antenna phasing, and residual
  definitions replicate the reference exactly (verified by differential
  tests against the reference kernels in tests/test_solvers.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaintable import GainTable, create_gaintable_from_visibility
from ..models.visibility import Visibility
from .visibility_ops import divide_visibility

__all__ = ["solve_gaintable", "solve_gains_core"]


def _symmetrise(x, xwt):
    """Zero the diagonal and mirror the lower triangle into the upper
    (solvers.py:249-257): x[i,j] for i<j becomes conj(x[j,i])."""
    nants = x.shape[0]
    i = jnp.arange(nants)[:, None, None]
    j = jnp.arange(nants)[None, :, None]
    # broadcast index grids against trailing dims via reshape
    extra = (1,) * (x.ndim - 2)
    i = i.reshape((nants, 1) + extra)
    j = j.reshape((1, nants) + extra)
    xt = jnp.swapaxes(x, 0, 1)
    xwtt = jnp.swapaxes(xwt, 0, 1)
    x = jnp.where(i > j, x, jnp.conj(xt))
    xwt = jnp.where(i > j, xwt, xwtt)
    diag = i == j
    return jnp.where(diag, 0.0, x), jnp.where(diag, 0.0, xwt)


def ne_index_map(a1, a2, nants):
    """Static cell->column map for gather-based normal-equation assembly:
    cell (i, j) of the [nants, nants] antenna matrix reads column
    ``ne_idx[i*nants+j]`` of ``[conj(xb); xb; 0]`` (width 2*nbl+1).
    Matches the scatter form ``x.at[:, a1, a2].set(conj(xb))
    .at[:, a2, a1].set(xb)`` including its last-write-wins semantics.
    The gather runs ~15x faster than the four scatters at the 10M
    BASELINE shape ([267, 37401] -> [267, 274, 274])."""
    nbl = len(a1)
    idx = np.full((nants, nants), 2 * nbl, np.int32)
    k = np.arange(nbl, dtype=np.int32)
    idx[a1, a2] = k
    idx[a2, a1] = k + nbl
    return idx.reshape(-1)


def _gain_substitution_scalar(gain, xxwt, ww):
    """g_j <- sum_i g_i x_ij w_ij / sum_i |g_i|^2 w_ij (solvers.py:287-320).

    gain: [nants, nchan, 1, 1]; xxwt = x*w and ww: [nants, nants, nchan]
    (both loop-invariant — precomputed by the caller so the iteration
    never rematerialises the 2 nants^2-sized products).

    The reductions are written as broadcast-multiply + sum rather than
    einsum: as dots they are batched MATVECS (N=1), which the MXU runs
    at ~1/128 lane utilisation — measured ~10 ms per iteration at
    [267, 274, 274]; the VPU form is bandwidth-bound.
    """
    g = gain[..., 0, 0]  # [nants, nchan]
    top = jnp.sum(g[:, None, :] * xxwt, axis=0)
    bot = jnp.sum(
        (g * jnp.conj(g)).real[:, None, :] * ww, axis=0
    )
    ok = bot > 0.0
    newg = jnp.where(ok, top / jnp.where(ok, bot, 1.0).astype(top.dtype), 0.0)
    gwt = jnp.where(ok, bot, 0.0)
    return newg[..., None, None], gwt[..., None, None]


def _gain_substitution_matrix(gain, wx, w):
    """Entrywise 2x2 substitution (solvers.py:440-478).

    gain: [nants, nchan, 2, 2]; wx = w*x and w (off-diagonal-masked
    weights): [nants, nants, nchan, 2, 2], both loop-invariant —
    precomputed by the caller. Reductions are broadcast-multiply + sum
    (VPU) rather than einsum matvecs (see _gain_substitution_scalar).
    """
    # top_j = sum_i w_ij x_ij g_i ; bot_i = sum_j w_ij |g_j|^2 (elementwise)
    top = jnp.sum(wx * gain[:, None], axis=0)
    bot = jnp.sum(w * (gain * jnp.conj(gain)).real[None, :], axis=1)
    # reference zeroes the numerator and forces the denominator to 1 where
    # bot <= 0 (solvers.py:470-475); gwt is the *unmasked* bot
    ok = bot > 0.0
    newg = jnp.where(ok, top / jnp.where(ok, bot, 1.0).astype(top.dtype), 0.0)
    return newg, bot


def _phase_normalise(gain):
    """gain / |gain| where |gain| > 0 (solvers.py:263-264)."""
    a = jnp.abs(gain)
    ok = a > 0.0
    return jnp.where(ok, gain / jnp.where(ok, a, 1.0).astype(gain.dtype), gain)


def _solution_residual_scalar(gain, x, xwt):
    """RMS weighted residual, scalar path (solvers.py:481-516).

    Returns [nchan, nrec, nrec] (nrec=1).
    """
    g = gain[..., 0, 0]  # [nants, nchan]
    xx = x[..., 0]
    ww = xwt[..., 0]
    smueller = jnp.einsum("ik,jk->ijk", jnp.conj(g), g)
    error = xx - smueller
    nants = g.shape[0]
    eye = jnp.eye(nants, dtype=bool)[:, :, None]
    error = jnp.where(eye, 0.0, error)
    res = jnp.sum((error * ww.astype(error.dtype) * jnp.conj(error)).real, axis=(0, 1))
    sumwt = jnp.sum(ww, axis=(0, 1))
    ok = sumwt > 0.0
    res = jnp.where(ok, jnp.sqrt(res / jnp.where(ok, sumwt, 1.0)), 0.0)
    return res[:, None, None]


def _solution_residual_matrix(gain, x, xwt):
    """RMS weighted residual, matrix path (solvers.py:519-539).

    Returns [nchan, 2, 2].
    """
    ggh = jnp.einsum("i...,j...->ij...", jnp.conj(gain), gain)
    err = jnp.conj(x - ggh)
    res = jnp.sum((err * xwt.astype(err.dtype) * jnp.conj(err)).real, axis=(0, 1))
    sumwt = jnp.sum(xwt, axis=(0, 1))
    ok = sumwt > 0.0
    return jnp.where(ok, jnp.sqrt(res / jnp.where(ok, sumwt, 1.0)), 0.0)


def _solve_scalar_one(x, xwt, gain0, niter, tol, phase_only, refant, damping):
    """Scalar-path solve for one solution interval
    (solvers.py:217-284). x: [nants, nants, nchan, 1]."""
    x, xwt = _symmetrise(x, xwt)
    ww = xwt[..., 0]
    xxwt = x[..., 0] * ww.astype(x.dtype)

    def body(state):
        gain, gwt, change, it = state
        newgain, newgwt = _gain_substitution_scalar(gain, xxwt, ww)
        if phase_only:
            newgain = _phase_normalise(newgain)
        angles = jnp.angle(newgain)
        newgain = newgain * jnp.exp(-1j * angles)[refant, ...]
        newgain = (1.0 - damping) * newgain + damping * gain
        change = jnp.max(jnp.abs(newgain - gain))
        return newgain, newgwt, change, it + 1

    def cond(state):
        _, _, change, it = state
        return (it < niter) & (change >= tol)

    gwt0 = jnp.zeros(gain0.shape, dtype=xwt.dtype)
    init = (gain0, gwt0, jnp.asarray(jnp.inf, dtype=xwt.dtype), 0)
    gain, gwt, _, _ = jax.lax.while_loop(cond, body, init)
    if phase_only:
        gain = _phase_normalise(gain)
    residual = _solution_residual_scalar(gain, x, xwt)
    return gain, gwt, residual


def _solve_matrix_one(x, xwt, gain0, niter, tol, phase_only):
    """Matrix-path solve for one interval (solvers.py:378-437).
    x: [nants, nants, nchan, 2, 2] (already embedded if npol==2)."""
    x, xwt = _symmetrise(x, xwt)
    gain0 = gain0.at[..., 0, 1].set(0.0).at[..., 1, 0].set(0.0)
    nants = gain0.shape[0]
    i = jnp.arange(nants)
    offdiag = (i[:, None] != i[None, :]).astype(xwt.dtype)[
        :, :, None, None, None
    ]
    w = xwt * offdiag
    wx = w.astype(x.dtype) * x

    def body(state):
        gain, gwt, change, it = state
        newgain, newgwt = _gain_substitution_matrix(gain, wx, w)
        if phase_only:
            newgain = _phase_normalise(newgain)
        change = jnp.max(jnp.abs(newgain - gain))
        newgain = 0.5 * (newgain + gain)
        return newgain, newgwt, change, it + 1

    def cond(state):
        _, _, change, it = state
        return (it < niter) & (change >= tol)

    gwt0 = jnp.zeros(gain0.shape, dtype=xwt.dtype)
    init = (gain0, gwt0, jnp.asarray(jnp.inf, dtype=xwt.dtype), 0)
    gain, gwt, _, _ = jax.lax.while_loop(cond, body, init)
    residual = _solution_residual_matrix(gain, x, xwt)
    return gain, gwt, residual


@partial(
    jax.jit,
    static_argnames=("niter", "phase_only", "crosspol", "npol"),
)
def solve_gains_core(
    x,
    xwt,
    gain0,
    *,
    niter: int = 200,
    tol: float = 1e-6,
    phase_only: bool = True,
    crosspol: bool = False,
    npol: int = 1,
    refant: int = 0,
    damping: float = 0.5,
):
    """Solve antenna gains from point-source-equivalent visibilities, batched
    over solution intervals.

    :param x: [nsol, nants, nants, nchan, npol] complex
    :param xwt: matching real weights
    :param gain0: [nsol, nants, nchan, nrec, nrec] initial gains
    :return: (gain, gwt, residual) with reference solver semantics
    """
    nsol, nants, _, nchan, _ = x.shape

    # normalise x by weights; scale weights by their max (solvers.py:164-168)
    ok = xwt > 0.0
    xn = jnp.where(ok, x / jnp.where(ok, xwt, 1.0).astype(x.dtype), 0.0)
    wmax = jnp.max(
        jnp.where(ok, xwt, 0.0), axis=(1, 2, 3, 4), keepdims=True
    )
    wn = jnp.where(
        ok, xwt / jnp.where(wmax > 0, wmax, 1.0), 0.0
    )

    if npol == 2 or (npol == 4 and not crosspol):
        # embed into a 4-pol diagonal problem (solvers.py:323-375)
        if npol == 2:
            z = jnp.zeros_like(xn[..., 0])
            zw = jnp.zeros_like(wn[..., 0])
            x4 = jnp.stack(
                [xn[..., 0], z, z, xn[..., 1]], axis=-1
            )
            w4 = jnp.stack([wn[..., 0], zw, zw, wn[..., 1]], axis=-1)
        else:
            x4 = xn.at[..., 1].set(0.0).at[..., 2].set(0.0)
            w4 = wn.at[..., 1].set(0.0).at[..., 2].set(0.0)
        x22 = x4.reshape(nsol, nants, nants, nchan, 2, 2)
        w22 = w4.reshape(nsol, nants, nants, nchan, 2, 2)
        solver = jax.vmap(
            lambda xi, wi, gi: _solve_matrix_one(
                xi, wi, gi, niter, tol, phase_only
            )
        )
        return solver(x22, w22, gain0)
    if npol == 4 and crosspol:
        x22 = xn.reshape(nsol, nants, nants, nchan, 2, 2)
        w22 = wn.reshape(nsol, nants, nants, nchan, 2, 2)
        solver = jax.vmap(
            lambda xi, wi, gi: _solve_matrix_one(
                xi, wi, gi, niter, tol, phase_only
            )
        )
        return solver(x22, w22, gain0)
    # scalar
    solver = jax.vmap(
        lambda xi, wi, gi: _solve_scalar_one(
            xi, wi, gi, niter, tol, phase_only, refant, damping
        )
    )
    return solver(xn, wn, gain0)


def build_normal_equations(point_vis: Visibility, gain_table: GainTable):
    """Accumulate per-interval antenna-pair visibility matrices.

    Mirrors solvers.py:84-114: per solution interval, sum vis*weight over
    times (and channels if the table is single-channel), then scatter
    baselines into [nants, nants] with the conjugate below/above diagonal.

    Returns (x [nsol, nants, nants, nchan_sol, npol], xwt alike).
    """
    nants = point_vis.nants
    # interval membership [nsol, ntime] (xarray .sel slices are inclusive)
    t = point_vis.time[None, :]
    lo = (gain_table.time - gain_table.interval / 2)[:, None]
    hi = (gain_table.time + gain_table.interval / 2)[:, None]
    w_t = ((t >= lo) & (t <= hi)).astype(point_vis.weight.dtype)

    fw = point_vis.flagged_weight
    xw = point_vis.vis * fw.astype(point_vis.vis.dtype)
    if gain_table.nchan == 1 and point_vis.nchan >= 1:
        xb = jnp.einsum("st,tbfp->sbp", w_t.astype(xw.dtype), xw)[:, :, None, :]
        wb = jnp.einsum("st,tbfp->sbp", w_t, fw)[:, :, None, :]
    else:
        xb = jnp.einsum("st,tbfp->sbfp", w_t.astype(xw.dtype), xw)
        wb = jnp.einsum("st,tbfp->sbfp", w_t, fw)
    nsol = w_t.shape[0]
    nchan = xb.shape[2]
    npol = xb.shape[3]
    from ..config import czeros

    # gather-based antenna-pair assembly (see ne_index_map): one static
    # take per array instead of four scatters (15x at the 10M BASELINE)
    ne_idx = jnp.asarray(
        ne_index_map(
            np.asarray(point_vis.antenna1),
            np.asarray(point_vis.antenna2),
            nants,
        )
    )
    zx = czeros((nsol, 1, nchan, npol), xb.dtype)
    ext = jnp.concatenate([jnp.conj(xb), xb, zx], axis=1)
    x = jnp.take(ext, ne_idx, axis=1).reshape(
        nsol, nants, nants, nchan, npol
    )
    zw = jnp.zeros((nsol, 1, nchan, npol), dtype=wb.dtype)
    extw = jnp.concatenate([wb, wb, zw], axis=1)
    xwt = jnp.take(extw, ne_idx, axis=1).reshape(
        nsol, nants, nants, nchan, npol
    )
    return x, xwt


def solve_gaintable(
    vis: Visibility,
    modelvis: Visibility | None = None,
    gain_table: GainTable | None = None,
    phase_only: bool = True,
    niter: int = 200,
    tol: float = 1e-6,
    crosspol: bool = False,
    normalise_gains: str | None = "mean",
    jones_type: str = "T",
    timeslice=None,
) -> GainTable:
    """Solve a gain table fitting observed to model visibility
    (solvers.py:21-145). A point-source model is assumed if ``modelvis`` is
    None.
    """
    point_vis = (
        divide_visibility(vis, modelvis) if modelvis is not None else vis
    )
    if gain_table is None:
        gain_table = create_gaintable_from_visibility(
            vis, jones_type=jones_type, timeslice=timeslice
        )
    x, xwt = build_normal_equations(point_vis, gain_table)
    has_data = jnp.sum(jnp.abs(xwt), axis=(1, 2, 3, 4)) > 0.0  # [nsol]

    gain, gwt, residual = solve_gains_core(
        x,
        xwt,
        gain_table.gain,
        niter=niter,
        tol=tol,
        phase_only=phase_only,
        crosspol=crosspol,
        npol=vis.npol,
    )
    # intervals with no data keep unit gain / zero weight (solvers.py:130-133)
    hd = has_data[:, None, None, None, None]
    # real ones broadcast: avoids a host-side complex constant (axon)
    gain = jnp.where(hd, gain, jnp.ones(gain.shape, dtype=jnp.float32).astype(gain.dtype))
    gwt = jnp.where(hd, gwt, jnp.zeros_like(gwt))
    residual = jnp.where(
        has_data[:, None, None, None], residual, jnp.zeros_like(residual)
    )

    if normalise_gains in ("median", "mean") and not phase_only:
        if normalise_gains == "mean":
            gabs = jnp.mean(jnp.abs(gain))
        else:
            gabs = jnp.median(jnp.abs(gain))
        gain = gain / gabs.astype(gain.dtype)

    return gain_table.replace(gain=gain, weight=gwt, residual=residual)
