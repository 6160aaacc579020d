"""First-class imaging pipelines: continuum imaging and ICAL self-cal.

The reference leaves the major-cycle loop to external pipeline frameworks
(SURVEY.md §3.5; composed from skymodel_imaging + chain_calibration +
deconvolution as in tests/sky_model/test_skymodel_imaging.py). Here it is a
first-class, checkpointable driver:

    loop over major cycles:
        model vis   = predict(image) + DFT(components)      (ops/imaging, dft)
        gaintables  = calibrate_chain(vis, model_vis)       (ops/calibration_chain)
        residual    = vis_corrected - model_vis
        dirty       = invert(residual)                       [+ PSF once]
        model      += deconvolve(dirty, psf)                (ops/deconvolution)
    restore(model, psf, residual)
"""

from __future__ import annotations

import dataclasses
import logging
import typing
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import zeros_like_safe
from .models.components import SkyComponents
from .models.image import Image
from .models.visibility import Visibility
from .ops.calibration_chain import (
    calibrate_chain,
    create_calibration_controls,
)
from .ops.deconvolution import deconvolve_cube, restore_cube
from .ops.dft import dft_skycomponent_visibility
from .ops.imaging import (
    invert_visibility,
    make_visibility_plan,
    predict_visibility,
)
from .ops.visibility_ops import subtract_visibility

log = logging.getLogger("ska-sdp-func-python-tpu")

__all__ = ["continuum_imaging", "ical", "SelfCalState"]


@dataclasses.dataclass
class SelfCalState:
    """Checkpointable self-cal state: (model, gaintables, cycle index)."""

    model: Image
    gaintables: dict
    cycle: int

    def save(self, path: str):
        import pickle

        import jax

        host = jax.tree_util.tree_map(np.asarray, (self.model, self.cycle))
        gts = {
            k: jax.tree_util.tree_map(np.asarray, v)
            for k, v in self.gaintables.items()
        }
        with open(path, "wb") as fh:
            pickle.dump({"model_cycle": host, "gaintables": gts}, fh)

    @classmethod
    def load(cls, path: str) -> "SelfCalState":
        import pickle

        with open(path, "rb") as fh:
            blob = pickle.load(fh)
        model, cycle = blob["model_cycle"]
        return cls(model=model, gaintables=blob["gaintables"], cycle=cycle)

    def export_gaintables(self, path: str) -> None:
        """Write the solutions to a standalone HDF5/npz file (the h5parm
        role of the reference's DP3 bridge, dp3_calibration.py:33-35) —
        readable without unpickling the full state via
        :func:`ska_sdp_func_python_tpu.io.load_gaintables`."""
        from .io import save_gaintables

        save_gaintables(self.gaintables, path)

    @classmethod
    def import_gaintables(cls, model, path: str, cycle: int = 0):
        """Build a state from a standalone solution file + model image."""
        from .io import load_gaintables

        return cls(
            model=model, gaintables=load_gaintables(path), cycle=cycle
        )


class _SortedWorkspace:
    """Image-frame, plan-sorted visibility workspace for sort-free major
    cycles.

    The plan-based invert/predict spend ~40% of each call in per-call value
    sorts (in and out of the gridder's segment order). A major-cycle loop
    runs entirely in the *sorted domain*: observed values and weights are
    sorted once here, model visibilities come out of
    ``predict_with_plan(to_sorted=True)`` already sorted, the residual
    subtraction is elementwise, and ``invert_with_plan(values_sorted=True)``
    consumes it directly — zero per-cycle sorts. The reference has no
    analogue (ducc0 re-bins uvw every call, imaging/ng.py:146-293).
    """

    def __init__(self, vis, model, plan, components=None):
        from .models.polarisation import convert_pol_frame
        from .ops.gridding_plan import sort_values, sort_values_real
        from .ops.imaging import shift_vis_to_image

        svis = shift_vis_to_image(vis, model)
        ms = convert_pol_frame(
            svis.flagged_vis,
            vis.polarisation_frame,
            model.polarisation_frame,
            polaxis=3,
        )
        wgt = svis.flagged_imaging_weight
        if wgt.shape[-1] != ms.shape[-1]:
            wgt = jnp.broadcast_to(
                wgt[..., :1], ms.shape[:-1] + (ms.shape[-1],)
            )
        comp_ms = None
        if components is not None and components.ncomp > 0:
            cvis = dft_skycomponent_visibility(
                vis.replace(vis=zeros_like_safe(vis.vis)), components
            )
            cvis = shift_vis_to_image(cvis, model)
            comp_ms = convert_pol_frame(
                cvis.vis,
                vis.polarisation_frame,
                model.polarisation_frame,
                polaxis=3,
            )
        self.plan = plan
        self.npol = ms.shape[-1]
        # natural-order image-frame arrays, kept for the fused self-cal
        # solver leg (X = V_obs/V_model is invariant under the phase shift,
        # so gains can be solved in the image frame)
        self.ms_nat = ms
        self.fw_nat = svis.flagged_weight
        self.obs_s = []
        self.wgt_s = []
        self.comp_s = []
        for ichan in range(plan.nchan):
            fsel = slice(None) if plan.mfs else slice(ichan, ichan + 1)
            gp = plan.plans[ichan].gp
            obs_row, wgt_row, comp_row = [], [], []
            for pol in range(self.npol):
                obs_row.append(
                    sort_values(gp, ms[:, :, fsel, pol].reshape(-1))
                )
                wgt_row.append(
                    sort_values_real(gp, wgt[:, :, fsel, pol].reshape(-1))
                )
                if comp_ms is not None:
                    comp_row.append(
                        sort_values(
                            gp, comp_ms[:, :, fsel, pol].reshape(-1)
                        )
                    )
            self.obs_s.append(obs_row)
            self.wgt_s.append(wgt_row)
            self.comp_s.append(comp_row if comp_ms is not None else None)

    def model_sorted(self, ichan: int, pol: int, current: Image | None):
        """Plan-sorted model visibilities for one (channel, pol)."""
        from .ops.imaging import predict_with_plan

        model_s = None
        if current is not None:
            model_s = predict_with_plan(
                self.plan.plans[ichan],
                current.pixels[ichan, pol],
                to_sorted=True,
            )
        if self.comp_s[ichan] is not None:
            cs = self.comp_s[ichan][pol]
            model_s = cs if model_s is None else model_s + cs
        return model_s

    def residual_invert(
        self,
        template: Image,
        current: Image | None,
        model_nonzero: bool | None = None,
    ):
        """One sort-free major-cycle leg: predict (sorted) -> subtract ->
        invert. Returns the normalised residual Image and sumwt.

        ``model_nonzero`` lets callers that track the model state host-side
        (e.g. "have we run a minor cycle yet?") skip the device round-trip
        of checking whether ``current`` is all-zero."""
        from .ops.imaging import invert_with_plan, normalise_sumwt

        if model_nonzero is None:
            model_nonzero = current is not None and bool(
                jnp.max(jnp.abs(current.pixels)) > 0.0
            )
        use_model = current is not None and model_nonzero
        pixels = jnp.zeros_like(template.pixels)
        sumwt = jnp.zeros(
            (self.plan.nchan, self.npol), dtype=jnp.float32
        )
        for ichan in range(self.plan.nchan):
            for pol in range(self.npol):
                model_s = self.model_sorted(
                    ichan, pol, current if use_model else None
                )
                resid_s = (
                    self.obs_s[ichan][pol]
                    if model_s is None
                    else self.obs_s[ichan][pol] - model_s
                )
                dirty, swt = invert_with_plan(
                    self.plan.plans[ichan],
                    resid_s,
                    self.wgt_s[ichan][pol],
                    values_sorted=True,
                )
                pixels = pixels.at[ichan, pol].set(
                    dirty.astype(pixels.dtype)
                )
                sumwt = sumwt.at[ichan, pol].set(swt)
        residual = normalise_sumwt(template.with_pixels(pixels), sumwt)
        return residual, sumwt


class _FusedTermCfg(typing.NamedTuple):
    """Static per-Jones-term configuration (one entry per letter of the
    calibration context, e.g. ("T", "G"))."""

    name: str
    phase_only: bool
    first_selfcal: int
    # per-channel gaintable (bandpass "B"): normal equations keep the
    # frequency axis and the inverse-apply factors are per (t, b, f)
    per_chan: bool = False
    # full-Jones (controls shape "matrix"): 2x2 matrix StefCal solve and
    # a Mueller (kron) inverse apply mixing the four pol columns
    crosspol: bool = False


class _FusedCfg(typing.NamedTuple):
    """Static (hashable) configuration for the fused self-cal cycle."""

    nchan: int
    npol: int
    mfs: bool
    terms: tuple  # of _FusedTermCfg
    normalise_gains: str | None
    solver_niter: int
    solver_tol: float
    algorithm: str
    clean_gain: float
    clean_niter: int
    clean_thresh: float
    clean_frac: float
    scales: tuple
    nmoment: int = 3
    findpeak: str = "RASCIL"


# receptor-pair map per polarisation column for diagonal Jones application:
# V'_p = V_p / (g1[r1,r1] conj(g2[r2,r2]))
_POL_RECS = {
    1: ((0, 0),),
    2: ((0, 0), (1, 1)),
    4: ((0, 0), (0, 1), (1, 0), (1, 1)),
}


def _build_benes(plan):
    """Per-channel Beneš permutation plans for the fused cycle's
    plan-order <-> natural-order moves (ops/permute.py): replaces the two
    per-cycle ~33 ms lax.sort permutation applies with precomputed
    butterfly networks (~3 HBM passes on TPU). Controlled by
    ``config.use_benes()``; returns None to fall back to lax.sort."""
    from . import config as _cfg

    mode = _cfg.use_benes()
    if mode == "off":
        return None
    from .ops.permute import _load_lib, benes_plan

    n0 = int(plan.plans[0].gp.n)
    if mode == "auto" and _load_lib() is None and n0 > (1 << 16):
        return None  # Python-fallback routing is too slow at scale
    try:
        out = []
        for pl in plan.plans:
            gp = pl.gp
            perm = np.asarray(
                jax.lax.bitcast_convert_type(
                    gp.geo[3, : gp.n], jnp.int32
                )
            )
            out.append(benes_plan(perm))
        return tuple(out)
    except Exception:
        if mode == "on":
            raise
        log.warning(
            "Benes plan build failed; falling back to lax.sort",
            exc_info=True,
        )
        return None


def _benes_fn(bp):
    """Apply-function choice at trace time: the 3-pass Pallas kernel on
    TPU (within its n range), the XLA butterfly chain elsewhere."""
    from .ops.permute import benes_apply

    if jax.default_backend() == "tpu" and 10 <= bp.n <= 25:
        from .ops.permute_pallas import benes_apply_tpu

        return benes_apply_tpu
    return benes_apply


def _solve_terms(state, cfg, gains, do_cal, mvis, psum_axis):
    """Sequential Jones-term solves + inverse-apply factor accumulation.

    For each active term: product-form normal equations
    ``x*w = V conj(V_model) w``, ``xwt = |V_model|^2 w`` (identical to
    divide_visibility + accumulate without the quotient,
    visibility/operations.py:145-189, calibration/solvers.py:99-114) from
    the running corrected visibilities, one einsum over the
    interval-membership matrix + static baseline scatter (psum'd across a
    sharded mesh), the batched StefCal solve, then the per-(time,
    baseline, pol) inverse factors of the diagonal Jones:
    V'_p = V_p / (g1[r1,r1] conj(g2[r2,r2])).

    Returns (gains, gain weights, residuals, total inverse factor
    [ntime, nbl, npol] or None).
    """
    from .config import czeros
    from .ops.solvers import solve_gains_core

    npol = cfg.npol
    a1, a2 = state["a1"], state["a2"]
    fw = state["fw_nat"]
    corrected = state["ms_nat"]
    recs = _POL_RECS[npol]
    new_gains = list(gains)
    gwts = list(state["gain_wt"])
    gress = list(state["gain_res"])
    # matrix mode (any full-Jones term in the chain): the running
    # correction is a [ntime, nbl, Fc, 4, 4] Mueller matrix; diagonal
    # terms contribute diagonal Muellers. Elementwise [ntime, nbl, Fc,
    # npol] factors otherwise.
    matrix_mode = any(t.crosspol for t in cfg.terms)
    inv_tot = None

    for it, term in enumerate(cfg.terms):
        if not do_cal[it]:
            continue
        cal = state["cal"][it]
        xe = corrected * jnp.conj(mvis) * fw.astype(corrected.dtype)
        we = (jnp.real(mvis) ** 2 + jnp.imag(mvis) ** 2) * fw
        w_t = cal["w_t"]
        if term.per_chan:
            # bandpass: solve every frequency channel separately —
            # the normal equations keep the channel axis
            # (chain_calibration.py "B" semantics)
            xb = jnp.einsum("st,tbfp->sbfp", w_t.astype(xe.dtype), xe)
            wb = jnp.einsum("st,tbfp->sbfp", w_t, we)
        else:
            xb = jnp.einsum("st,tbfp->sbp", w_t.astype(xe.dtype), xe)[
                :, :, None, :
            ]
            wb = jnp.einsum("st,tbfp->sbp", w_t, we)[:, :, None, :]
        nchan_sol = xb.shape[2]
        nsol = w_t.shape[0]
        nants = gains[it].shape[1]
        # antenna-pair assembly as ONE static gather per array (the
        # scatter form costs ~11 ms at the 10M BASELINE vs 0.7 ms for
        # the gather; ne_idx maps cell (i,j) -> column of
        # [conj(xb); xb; 0])
        zx = czeros((nsol, 1, nchan_sol, npol), xb.dtype)
        ext = jnp.concatenate([jnp.conj(xb), xb, zx], axis=1)
        x = jnp.take(ext, state["ne_idx"], axis=1).reshape(
            nsol, nants, nants, nchan_sol, npol
        )
        zw = jnp.zeros((nsol, 1, nchan_sol, npol), dtype=wb.dtype)
        extw = jnp.concatenate([wb, wb, zw], axis=1)
        xwt = jnp.take(extw, state["ne_idx"], axis=1).reshape(
            nsol, nants, nants, nchan_sol, npol
        )
        if psum_axis is not None:
            # baseline-sharded: assemble the full normal equations
            # across the mesh (SURVEY.md 2c / BASELINE north star)
            x = jax.lax.psum(x, psum_axis)
            xwt = jax.lax.psum(xwt, psum_axis)
        has_data = jnp.sum(jnp.abs(xwt), axis=(1, 2, 3, 4)) > 0.0

        gain_new, gwt, gres = solve_gains_core(
            x,
            xwt,
            gains[it],
            niter=cfg.solver_niter,
            tol=cfg.solver_tol,
            phase_only=term.phase_only,
            crosspol=term.crosspol,
            npol=npol,
        )
        hd = has_data[:, None, None, None, None]
        eye = jnp.broadcast_to(
            jnp.eye(gain_new.shape[-1], dtype=jnp.float32),
            gain_new.shape,
        )
        gain_new = jnp.where(hd, gain_new, eye.astype(gain_new.dtype))
        gwt = jnp.where(hd, gwt, jnp.zeros_like(gwt))
        gres = jnp.where(
            has_data[:, None, None, None], gres, jnp.zeros_like(gres)
        )
        if (
            cfg.normalise_gains in ("mean", "median")
            and not term.phase_only
        ):
            gabs = (
                jnp.mean(jnp.abs(gain_new))
                if cfg.normalise_gains == "mean"
                else jnp.median(jnp.abs(gain_new))
            )
            gain_new = gain_new / gabs.astype(gain_new.dtype)
        new_gains[it], gwts[it], gress[it] = gain_new, gwt, gres

        # [ntime, nants, Fc, nrec, nrec] with Fc = 1 (T/G) or nchan (B)
        gg = gain_new[cal["row_idx"]]
        hr = cal["has_row"][:, None, None]
        if term.crosspol:
            # full-Jones: V'(2x2) = J1^-1 V J2^-H, i.e. the 4-pol column
            # picks up the Mueller M[(i,l),(j,k)] = J1inv[i,j]
            # conj(J2inv[l,k]) (reference matrix apply,
            # calibration/operations.py smueller semantics)
            from .ops.gain_ops import _inv2x2

            gi, okd = _inv2x2(gg, min_det=1e-30)
            g1i = jnp.take(gi, a1, axis=1)  # [t, nbl, Fc, 2, 2]
            g2i = jnp.take(gi, a2, axis=1)
            mm = jnp.einsum(
                "tbfij,tbflk->tbfiljk", g1i, jnp.conj(g2i)
            )
            t_, b_, f_ = mm.shape[:3]
            mm = mm.reshape(t_, b_, f_, 4, 4)
            eye4 = jnp.eye(4, dtype=jnp.float32).astype(mm.dtype)
            ok1 = jnp.take(okd, a1, axis=1)
            ok2 = jnp.take(okd, a2, axis=1)
            okb = (ok1 & ok2)[..., None, None] & hr[..., None, None]
            mm = jnp.where(okb, mm, eye4)
            corrected = jnp.einsum(
                "tbfpq,tbgq->tbgp",
                mm,
                corrected,
            ) if f_ == 1 else jnp.einsum(
                "tbfpq,tbfq->tbfp", mm, corrected
            )
            inv = mm
        else:
            inv_pols = []
            for r1, r2 in recs:
                g1 = jnp.take(gg[:, :, :, r1, r1], a1, axis=1)
                g2 = jnp.take(gg[:, :, :, r2, r2], a2, axis=1)
                sm = g1 * jnp.conj(g2)  # [ntime, nbl, Fc]
                m2 = jnp.real(sm) ** 2 + jnp.imag(sm) ** 2
                ok = m2 > 0.0
                inv_p = jnp.where(
                    ok,
                    jnp.conj(sm)
                    / jnp.where(ok, m2, 1.0).astype(sm.dtype),
                    sm * 0.0,
                )
                # rows outside every solution interval stay uncorrected
                inv_pols.append(
                    jnp.where(
                        hr,
                        inv_p,
                        jnp.ones(inv_p.shape, jnp.float32).astype(
                            inv_p.dtype
                        ),
                    )
                )
            inv = jnp.stack(inv_pols, axis=-1)  # [ntime, nbl, Fc, npol]
            # apply over the vis channel axis (Fc broadcasts when 1)
            corrected = corrected * inv
            if matrix_mode:
                # promote the diagonal factors to a diagonal Mueller so
                # the chain composes by matmul
                inv = jnp.einsum(
                    "tbfp,pq->tbfpq",
                    inv,
                    jnp.eye(npol, dtype=jnp.float32),
                )
        if matrix_mode:
            if inv_tot is None:
                inv_tot = inv
            else:
                # Fc dims may differ across terms (matrix terms solve
                # Fc=1, bandpass "B" Fc=nchan): broadcast the frequency
                # axis before composing the Mueller chain.
                fc = max(inv.shape[2], inv_tot.shape[2])
                if inv.shape[2] != fc:
                    inv = jnp.broadcast_to(
                        inv, inv.shape[:2] + (fc,) + inv.shape[3:]
                    )
                if inv_tot.shape[2] != fc:
                    inv_tot = jnp.broadcast_to(
                        inv_tot,
                        inv_tot.shape[:2] + (fc,) + inv_tot.shape[3:],
                    )
                inv_tot = jnp.einsum(
                    "tbfpq,tbfqr->tbfpr", inv, inv_tot
                )
        else:
            inv_tot = inv if inv_tot is None else inv_tot * inv
    return new_gains, gwts, gress, inv_tot


@partial(
    jax.jit, static_argnames=("cfg", "do_cal", "with_model", "psum_axis")
)
def _fused_selfcal_cycle(
    state: dict,
    model_pixels,
    gains: tuple,
    *,
    cfg: _FusedCfg,
    do_cal: tuple,
    with_model: bool,
    psum_axis: str | None = None,
):
    """ONE dispatch per self-cal major cycle.

    Composes, inside a single XLA program: model degrid (plan-sorted),
    model back-sort, product-form normal equations, the batched StefCal
    solve, gain application in the sorted domain, residual invert, and the
    CLEAN minor-cycle loop. The reference's cycle (SURVEY.md §3.5) is ~10
    separate library calls; every host round-trip between them costs ~27 ms
    of dispatch latency on a remote TPU, and the unfused path re-sorts
    values three times per cycle. Here the only per-cycle host interaction
    is the single dispatch (plus an optional peak-residual fetch).

    Normal equations use the product form
    ``x*xwt = V_obs conj(V_model) w``, ``xwt = |V_model|^2 w`` — identical
    to divide_visibility + accumulate (visibility/operations.py:145-189,
    calibration/solvers.py:99-114) without materialising the quotient.
    """
    from .ops.gridding_plan import unsort_values
    from .ops.imaging import invert_with_plan, predict_with_plan
    from .ops.solvers import solve_gains_core

    plans = state["plans"]
    obs_s, wgt_s, comp_s = state["obs_s"], state["wgt_s"], state["comp_s"]
    nchan, npol = cfg.nchan, cfg.npol

    # ---- model visibilities, plan-sorted per (chan, pol) ----
    model_s = []
    for c in range(nchan):
        row = []
        for p in range(npol):
            ms_ = None
            if with_model:
                ms_ = predict_with_plan(
                    plans[c], model_pixels[c, p], to_sorted=True
                )
            if comp_s is not None:
                cs = comp_s[c][p]
                ms_ = cs if ms_ is None else ms_ + cs
            if ms_ is None:
                ms_ = obs_s[c][p] * 0.0
            row.append(ms_)
        model_s.append(row)

    any_cal = any(do_cal)
    new_gains = list(gains)
    gwts = list(state["gain_wt"])
    gress = list(state["gain_res"])
    benes = state.get("benes")
    if any_cal:
        # ---- natural-order model for the normal equations ----
        # Benes butterfly apply when the workspace precomputed routing
        # (3 HBM passes) instead of a full ~33 ms comparison sort
        ntime, nbl = state["cal"][0]["w_t"].shape[1], state["a1"].shape[0]
        chans = []
        for c in range(nchan):
            if benes is not None:
                fn = _benes_fn(benes[c])
                pols = [
                    fn(benes[c], model_s[c][p], inverse=True).reshape(
                        ntime, nbl, -1
                    )
                    for p in range(npol)
                ]
            else:
                pols = [
                    unsort_values(plans[c].gp, model_s[c][p]).reshape(
                        ntime, nbl, -1
                    )
                    for p in range(npol)
                ]
            chans.append(jnp.stack(pols, axis=-1))  # [t, b, nf_c, npol]
        mvis = chans[0] if cfg.mfs else jnp.concatenate(chans, axis=2)
        new_gains, gwts, gress, inv_tot = _solve_terms(
            state, cfg, gains, do_cal, mvis, psum_axis
        )

    # ---- residual invert per (chan, pol), all in the sorted domain ----
    matrix_mode = any(t.crosspol for t in cfg.terms)
    ny = nx = plans[0].npixel
    pixels = jnp.zeros((nchan, npol, ny, nx), jnp.float32)
    sumwt = jnp.zeros((nchan, npol), jnp.float32)
    if matrix_mode and any_cal:
        # full-Jones: the Mueller correction mixes pol columns, so the
        # corrected-minus-model residual is formed in NATURAL order
        # (where inv_tot lives) and ONE multi-payload sort per channel
        # brings all pols into plan order — same sort budget as the
        # diagonal lane's factor sort
        nf = state["ms_nat"].shape[2]
        if inv_tot.shape[2] == nf:
            corr_nat = jnp.einsum(
                "tbfpq,tbfq->tbfp", inv_tot, state["ms_nat"]
            )
        else:
            corr_nat = jnp.einsum(
                "tbfpq,tbgq->tbgp", inv_tot, state["ms_nat"]
            )
        resid_nat = corr_nat - mvis
    for c in range(nchan):
        if any_cal and matrix_mode:
            fsel = slice(None) if cfg.mfs else slice(c, c + 1)
            ops = []
            for p in range(npol):
                r_p = resid_nat[:, :, fsel, p].reshape(-1)
                ops.extend([jnp.real(r_p), jnp.imag(r_p)])
            if benes is not None:
                so = _benes_fn(benes[c])(benes[c], *ops)
                sorted_ops = so if isinstance(so, tuple) else (so,)
            else:
                sorted_ops = jax.lax.sort(
                    (plans[c].gp.rank, *ops), num_keys=1
                )[1:]
            resid_sp = [
                jax.lax.complex(sorted_ops[2 * p], sorted_ops[2 * p + 1])
                for p in range(npol)
            ]
        elif any_cal:
            # broadcast the factors over this plan's channel span, flatten
            # in (t, b, f) order, and bring every pol's factor into plan
            # order with ONE multi-payload sort
            nf_c = obs_s[c][0].shape[0] // (
                inv_tot.shape[0] * inv_tot.shape[1]
            )
            ops = []
            for p in range(npol):
                # inv_tot's channel axis is 1 (T/G, broadcast over the
                # plan's channel span) or nf_c (bandpass, per channel)
                f_p = jnp.broadcast_to(
                    inv_tot[:, :, :, p],
                    inv_tot.shape[:2] + (nf_c,),
                ).reshape(-1)
                ops.extend([jnp.real(f_p), jnp.imag(f_p)])
            if benes is not None:
                so = _benes_fn(benes[c])(benes[c], *ops)
                sorted_ops = so if isinstance(so, tuple) else (so,)
            else:
                sorted_ops = jax.lax.sort(
                    (plans[c].gp.rank, *ops), num_keys=1
                )[1:]
            inv_s = [
                jax.lax.complex(sorted_ops[2 * p], sorted_ops[2 * p + 1])
                for p in range(npol)
            ]
        for p in range(npol):
            if any_cal and matrix_mode:
                resid_s = resid_sp[p]
            else:
                corr = (
                    obs_s[c][p] * inv_s[p] if any_cal else obs_s[c][p]
                )
                resid_s = corr - model_s[c][p]
            if psum_axis is None:
                dirty, swt = invert_with_plan(
                    plans[c], resid_s, wgt_s[c][p], values_sorted=True
                )
            else:
                # grid the local shard, reduce-scatter the uv grids
                # over the mesh and run the n-way-parallel sharded tail
                # (uv_grids_to_dirty_scattered: ~2x less ring traffic
                # than psum + replicated tail)
                from .ops.gridding_plan import grid_with_plan
                from .ops.imaging import uv_grids_to_dirty_scattered

                weighted = resid_s * wgt_s[c][p].astype(resid_s.dtype)
                grids = grid_with_plan(
                    plans[c].gp, weighted, values_sorted=True
                )
                dirty = uv_grids_to_dirty_scattered(
                    plans[c], grids, psum_axis
                )
                swt = jax.lax.psum(
                    jnp.sum(wgt_s[c][p]), psum_axis
                )
            pixels = pixels.at[c, p].set(dirty.astype(jnp.float32))
            sumwt = sumwt.at[c, p].set(swt)
    okw = sumwt > 0.0
    scale = jnp.where(okw, 1.0 / jnp.where(okw, sumwt, 1.0), 0.0)
    residual = pixels * scale[:, :, None, None]

    # ---- CLEAN minor cycles ----
    comp_pixels = _fused_clean(
        residual, state["psf_patch"], cfg,
        window=state.get("clean_window"),
    )
    model_pixels = model_pixels + comp_pixels

    peak = jnp.max(jnp.abs(residual))
    return (
        model_pixels,
        tuple(new_gains),
        tuple(gwts),
        tuple(gress),
        residual,
        sumwt,
        peak,
    )


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "do_cal", "with_model", "psum_axis", "channel_axis"
    ),
)
def _fused_selfcal_cycle_cube(
    state: dict,
    model_pixels,
    gains: tuple,
    *,
    cfg: _FusedCfg,
    do_cal: tuple,
    with_model: bool,
    psum_axis: str | None = None,
    channel_axis: str | None = None,
):
    """Channel-batched fused major cycle for image cubes (nchan > 1).

    Same program as :func:`_fused_selfcal_cycle` but every per-channel
    leg — degrid, back-sort, factor sort, Pallas grid, FFT tail — runs as
    ONE vmapped op over the channel-stacked plans instead of ``nchan``
    separately-compiled instances (at MSMFS's 64 channels the unbatched
    graph would take hours to compile). Mosaic lifts the vmapped
    pallas_call into a batched grid; verified exact vs the per-plan calls
    on the real chip.

    ``psum_axis`` marks *baseline*-sharded execution (every device holds
    every channel of its baseline shard: uv grids and normal equations
    psum over the mesh). ``channel_axis`` marks *channel*-sharded
    execution (every device holds all baselines of ``cfg.nchan`` local
    channels: gridding/FFT/CLEAN lanes are fully local, and only the
    frequency-coupled reductions — gain normal equations and MSMFS
    moment transforms — psum over the mesh). The two are mutually
    exclusive; both ride ICI (SURVEY.md §2c rows 1 and 4).
    """
    from .ops.gridding_plan import unsort_values
    from .ops.imaging import invert_with_plan, predict_with_plan

    plans = state["plans"]  # channel-stacked ImagingPlan pytree
    obs_sa = state["obs_s"]  # [nchan, npol, n]
    wgt_sa = state["wgt_s"]
    comp_sa = state["comp_s"]
    nchan, npol = cfg.nchan, cfg.npol

    if with_model:
        model_sa = jax.vmap(
            lambda pl, imgs: jax.vmap(
                lambda im: predict_with_plan(pl, im, to_sorted=True)
            )(imgs)
        )(plans, model_pixels.astype(jnp.float32))
    else:
        model_sa = obs_sa * 0.0
    if comp_sa is not None:
        model_sa = model_sa + comp_sa

    any_cal = any(do_cal)
    new_gains = list(gains)
    gwts = list(state["gain_wt"])
    gress = list(state["gain_res"])
    benes = state.get("benes")
    if any_cal:
        ntime, nbl = state["cal"][0]["w_t"].shape[1], state["a1"].shape[0]
        if benes is not None:
            fn = _benes_fn(benes)
            mu = jax.vmap(
                lambda b, vs: jax.vmap(
                    lambda v: fn(b, v, inverse=True)
                )(vs)
            )(benes, model_sa)
        else:
            mu = jax.vmap(
                lambda pl, vs: jax.vmap(
                    lambda v: unsort_values(pl.gp, v)
                )(vs)
            )(plans, model_sa)
        mvis = mu.reshape(nchan, npol, ntime, nbl).transpose(2, 3, 0, 1)
        new_gains, gwts, gress, inv_tot = _solve_terms(
            state, cfg, gains, do_cal, mvis, psum_axis or channel_axis
        )
        # factor streams sorted into each channel plan's order with one
        # vmapped multi-payload sort over the stacked rank keys. T/G
        # factors are per (t, b) (broadcast over channels); bandpass
        # factors carry their own channel axis (Fc = nchan)
        inv_bc = jnp.broadcast_to(
            inv_tot, inv_tot.shape[:2] + (nchan, npol)
        )
        perchan = inv_bc.transpose(2, 3, 0, 1).reshape(nchan, npol, -1)

        if benes is not None:
            fn = _benes_fn(benes)

            def sort_chan_b(b, flat):
                ops = []
                for p in range(npol):
                    ops.extend([jnp.real(flat[p]), jnp.imag(flat[p])])
                so = fn(b, *ops)
                so = so if isinstance(so, tuple) else (so,)
                return jnp.stack(
                    [
                        jax.lax.complex(so[2 * p], so[2 * p + 1])
                        for p in range(npol)
                    ]
                )

            inv_sa = jax.vmap(sort_chan_b)(benes, perchan)
        else:

            def sort_chan(rank, flat):
                ops = []
                for p in range(npol):
                    ops.extend([jnp.real(flat[p]), jnp.imag(flat[p])])
                so = jax.lax.sort((rank, *ops), num_keys=1)[1:]
                return jnp.stack(
                    [
                        jax.lax.complex(so[2 * p], so[2 * p + 1])
                        for p in range(npol)
                    ]
                )

            inv_sa = jax.vmap(sort_chan)(
                plans.gp.rank, perchan
            )  # [nchan, npol, n]
        corr = obs_sa * inv_sa
    else:
        corr = obs_sa
    resid_sa = corr - model_sa

    if psum_axis is None:

        def invert_chan(pl, vs, ws):
            return jax.vmap(
                lambda v, wt: invert_with_plan(
                    pl, v, wt, values_sorted=True
                )
            )(vs, ws)

    else:
        from .ops.gridding_plan import grid_with_plan
        from .ops.imaging import uv_grids_to_dirty_scattered

        def invert_chan(pl, vs, ws):
            def one(v, wt):
                weighted = v * wt.astype(v.dtype)
                g = grid_with_plan(pl.gp, weighted, values_sorted=True)
                return (
                    uv_grids_to_dirty_scattered(pl, g, psum_axis),
                    jax.lax.psum(jnp.sum(wt), psum_axis),
                )

            return jax.vmap(one)(vs, ws)

    pixels, sumwt = jax.vmap(invert_chan)(plans, resid_sa, wgt_sa)
    okw = sumwt > 0.0
    scale = jnp.where(okw, 1.0 / jnp.where(okw, sumwt, 1.0), 0.0)
    residual = (pixels * scale[:, :, None, None]).astype(jnp.float32)

    comp_pixels = _fused_clean(
        residual,
        state["psf_patch"],
        cfg,
        state.get("mom_w"),
        mom_psum_axis=channel_axis,
        window=state.get("clean_window"),
    )
    model_pixels = model_pixels + comp_pixels

    peak = jnp.max(jnp.abs(residual))
    if channel_axis is not None:
        peak = jax.lax.pmax(peak, channel_axis)
    return (
        model_pixels,
        tuple(new_gains),
        tuple(gwts),
        tuple(gress),
        residual,
        sumwt,
        peak,
    )


def _fused_clean(
    residual,
    psf_patch,
    cfg: _FusedCfg,
    mom_w=None,
    mom_psum_axis=None,
    window=None,
):
    """In-graph deconvolution lanes (deconvolution.py:110-236 semantics).

    ``window``: optional [nchan, npol, ny, nx] clean window (1 = search
    allowed) for the hogbom/msclean lanes — find_window's "quarter"/
    "no_edge"/mask shapes run in-graph; windowed MSMFS composes instead
    (gated in ``ical``/``continuum_imaging``).

    ``mom_psum_axis``: mesh axis over which image channels are sharded —
    the MSMFS channel→moment transforms reduce over frequency, so the
    partial moment cubes psum across the mesh; hogbom/msclean lanes are
    per-channel and stay local.
    """
    from .ops.cleaners import hogbom, msclean

    nchan, npol, ny, nx = residual.shape
    if cfg.algorithm == "hogbom":
        d2 = residual.reshape(-1, ny, nx)
        p2 = psf_patch.reshape(-1, *psf_patch.shape[-2:])
        # lanes with an empty PSF (e.g. Q/U/V of an unpolarised PSF) get a
        # unit delta so the vmapped loop is benign; their components are
        # masked out (deconvolution.py:131-140 semantics)
        ok = jnp.max(p2, axis=(-2, -1)) > 0.0
        delta = jnp.zeros_like(p2).at[
            :, p2.shape[-2] // 2, p2.shape[-1] // 2
        ].set(1.0)
        p2_safe = jnp.where(ok[:, None, None], p2, delta)

        def lane(d, p, w=None):
            return hogbom(
                d,
                p,
                w,
                gain=cfg.clean_gain,
                thresh=cfg.clean_thresh,
                niter=cfg.clean_niter,
                fracthresh=cfg.clean_frac,
            )

        if window is None:
            cb, _ = jax.vmap(lane)(d2, p2_safe)
        else:
            cb, _ = jax.vmap(lane)(
                d2, p2_safe, window.reshape(-1, ny, nx)
            )
        cb = jnp.where(ok[:, None, None], cb, 0.0)
        return cb.reshape(residual.shape)
    if cfg.algorithm == "msclean":
        comp = jnp.zeros_like(residual)
        for c in range(nchan):
            for p in range(npol):
                cc, _ = msclean(
                    residual[c, p],
                    psf_patch[c, p],
                    window[c, p] if window is not None else None,
                    None,
                    gain=cfg.clean_gain,
                    thresh=cfg.clean_thresh,
                    niter=cfg.clean_niter,
                    scales=cfg.scales,
                    fracthresh=cfg.clean_frac,
                )
                comp = comp.at[c, p].set(cc.astype(comp.dtype))
        return comp
    if cfg.algorithm in ("msmfsclean", "mfsmsclean", "mmclean"):
        # MSMFS via frequency moments (deconvolution.py:237-300 semantics
        # without the host-side zero-PSF guard); mom_w = (w_m [nchan,
        # nmoment], w_pm [nchan, 2 nmoment]) moment-weight matrices
        # precomputed from the image frequency grid
        from .ops.cleaners import msmfsclean

        w_m, w_pm = mom_w
        dirty_t = jnp.einsum("cm,cpyx->mpyx", w_m, residual)
        psf_t = jnp.einsum("cm,cpyx->mpyx", w_pm, psf_patch)
        if mom_psum_axis is not None:
            dirty_t = jax.lax.psum(dirty_t, mom_psum_axis)
            psf_t = jax.lax.psum(psf_t, mom_psum_axis)
        psf_peak = jnp.max(psf_t)
        dpix = dirty_t / psf_peak
        ppix = psf_t / psf_peak
        comp_t = jnp.zeros_like(dirty_t)
        for p in range(npol):
            cc, _ = msmfsclean(
                dpix[:, p],
                ppix[:, 0],
                # clean windows are frequency-independent; one [ny, nx]
                # mask serves every moment plane (reference
                # deconvolution.py mmclean window semantics)
                window[0, p] if window is not None else None,
                None,
                gain=cfg.clean_gain,
                thresh=cfg.clean_thresh,
                niter=cfg.clean_niter,
                scales=cfg.scales,
                fracthresh=cfg.clean_frac,
                findpeak=cfg.findpeak,
            )
            comp_t = comp_t.at[:, p].set(cc.astype(comp_t.dtype))
        # back to the channel cube on the same frequency grid; the
        # psf_peak-normalised moment comps are already in per-channel
        # flux units (reference deconvolution.py:735-737 semantics)
        return jnp.einsum("cm,mpyx->cpyx", w_m, comp_t)
    raise ValueError(f"fused clean: unsupported algorithm {cfg.algorithm}")


class _FusedSelfCal(_SortedWorkspace):
    """Device-resident workspace for :func:`_fused_selfcal_cycle`.

    Supports the fully-fusable configurations: diagonal Jones terms —
    any combination of "T"/"G" (single-channel gaintables) and "B"
    (per-channel bandpass; the normal equations keep the frequency axis
    and the inverse factors are per (t, b, f)) — npol 1/2/4 visibilities
    in the model's polarisation frame, and windowless hogbom/msclean
    deconvolution. ``pipeline.ical`` falls back to the composed path
    otherwise.
    """

    def __init__(
        self,
        vis,
        model,
        plan,
        components,
        terms,
        controls,
        normalise_gains,
        solver_niter: int,
        solver_tol: float,
        psf: Image,
        **clean_kwargs,
    ):
        super().__init__(vis, model, plan, components)
        from .models.gaintable import create_gaintable_from_visibility
        from .ops.deconvolution import bound_psf, common_arguments
        from .ops.gain_ops import _gain_row_of_time

        self.benes = _build_benes(plan)
        self.gt0s, self.cal, term_cfgs = [], [], []
        for name in terms:
            gt0 = create_gaintable_from_visibility(
                vis,
                jones_type=name,
                timeslice=controls[name]["timeslice"],
            )
            t = vis.time[None, :]
            lo = (gt0.time - gt0.interval / 2)[:, None]
            hi = (gt0.time + gt0.interval / 2)[:, None]
            row_idx, has_row = _gain_row_of_time(
                vis.time, gt0.time, gt0.interval
            )
            self.gt0s.append(gt0)
            self.cal.append(
                {
                    "w_t": ((t >= lo) & (t <= hi)).astype(jnp.float32),
                    "row_idx": row_idx,
                    "has_row": has_row,
                }
            )
            term_cfgs.append(
                _FusedTermCfg(
                    name=name,
                    phase_only=controls[name]["phase_only"],
                    first_selfcal=controls[name]["first_selfcal"],
                    per_chan=gt0.gain.shape[2] > 1,
                    crosspol=controls[name].get("shape") == "matrix",
                )
            )
        self.a1 = jnp.asarray(vis.antenna1, jnp.int32)
        self.a2 = jnp.asarray(vis.antenna2, jnp.int32)
        from .ops.solvers import ne_index_map

        self.ne_idx = jnp.asarray(
            ne_index_map(
                np.asarray(vis.antenna1),
                np.asarray(vis.antenna2),
                vis.nants,
            )
        )
        bpsf = bound_psf(psf, psf, clean_kwargs.get("psf_support", None))
        self.psf_patch = bpsf.pixels.astype(jnp.float32)
        from .ops.deconvolution import find_window

        win = find_window(
            model,
            clean_kwargs.get("window_shape"),
            **{
                k: clean_kwargs[k]
                for k in ("mask", "window_edge")
                if k in clean_kwargs
            },
        )
        self.clean_window = (
            None
            if win is None
            else jnp.broadcast_to(
                jnp.asarray(win, jnp.float32), model.pixels.shape
            )
        )
        frac, cgain, cniter, cthresh, scales = common_arguments(
            **clean_kwargs
        )
        algorithm = clean_kwargs.get("algorithm", "msclean")
        if algorithm in ("msmfsclean", "mfsmsclean", "mmclean"):
            # mmclean's reference default loop gain is 0.7
            # (deconvolution.py:241)
            cgain = clean_kwargs.get("gain", 0.7)
            from .ops.taylor import moment_weights

            nmoment = clean_kwargs.get("nmoment", 3)
            freq = jnp.asarray(model.frequency)
            nm_psf = 2 * nmoment if nmoment > 1 else 1
            self.mom_w = (
                moment_weights(freq, None, nmoment).astype(jnp.float32),
                moment_weights(freq, None, nm_psf).astype(jnp.float32),
            )
        else:
            self.mom_w = None
        # solver weights need one column per converted pol
        fw = self.fw_nat
        if fw.shape[-1] != self.npol:
            fw = jnp.broadcast_to(
                fw[..., :1], fw.shape[:-1] + (self.npol,)
            )
        self.fw_nat = fw
        self.cfg = _FusedCfg(
            nchan=plan.nchan,
            npol=self.npol,
            mfs=plan.mfs,
            terms=tuple(term_cfgs),
            normalise_gains=normalise_gains,
            solver_niter=solver_niter,
            solver_tol=solver_tol,
            algorithm=algorithm,
            clean_gain=cgain,
            clean_niter=cniter,
            clean_thresh=cthresh,
            clean_frac=frac,
            scales=tuple(scales),
            nmoment=clean_kwargs.get("nmoment", 3),
            findpeak=clean_kwargs.get("findpeak", "RASCIL"),
        )

    def state(self, gwts, gress, cube: bool | None = None):
        if cube is None:
            cube = self.plan.nchan > 1
        if cube:
            # channel-batched layout for _fused_selfcal_cycle_cube:
            # channel-stacked plan pytree + [nchan, npol, n] streams
            plans = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *self.plan.plans
            )
            return {
                "plans": plans,
                "benes": (
                    jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *self.benes
                    )
                    if self.benes is not None
                    else None
                ),
                "obs_s": jnp.stack(
                    [jnp.stack(r) for r in self.obs_s]
                ),
                "wgt_s": jnp.stack(
                    [jnp.stack(r) for r in self.wgt_s]
                ),
                "comp_s": (
                    jnp.stack([jnp.stack(r) for r in self.comp_s])
                    if self.comp_s[0] is not None
                    else None
                ),
                "ms_nat": self.ms_nat,
                "fw_nat": self.fw_nat,
                "cal": tuple(self.cal),
                "a1": self.a1,
                "a2": self.a2,
                "ne_idx": self.ne_idx,
                "psf_patch": self.psf_patch,
                "clean_window": self.clean_window,
                "mom_w": self.mom_w,
                "gain_wt": tuple(gwts),
                "gain_res": tuple(gress),
            }
        return {
            "plans": tuple(self.plan.plans),
            "benes": self.benes,
            "obs_s": tuple(tuple(r) for r in self.obs_s),
            "wgt_s": tuple(tuple(r) for r in self.wgt_s),
            "comp_s": (
                tuple(tuple(r) for r in self.comp_s)
                if self.comp_s[0] is not None
                else None
            ),
            "ms_nat": self.ms_nat,
            "fw_nat": self.fw_nat,
            "cal": tuple(self.cal),
            "a1": self.a1,
            "a2": self.a2,
            "ne_idx": self.ne_idx,
            "psf_patch": self.psf_patch,
            "clean_window": self.clean_window,
            "mom_w": self.mom_w,
            "gain_wt": tuple(gwts),
            "gain_res": tuple(gress),
        }

    def gaintables(self, gains, gwts, gress) -> dict:
        return {
            t.name: gt0.replace(gain=g, weight=w, residual=r)
            for t, gt0, g, w, r in zip(
                self.cfg.terms, self.gt0s, gains, gwts, gress
            )
        }


def _window_fusable(kwargs) -> bool:
    """Clean windows ("quarter"/"no_edge"/explicit mask) run in-graph
    for every fused lane: hogbom/msclean mask the peak search directly,
    MSMFS masks the moment-domain search through msmfsclean's
    scale-convolved window stack (round-3; previously composed)."""
    if (
        kwargs.get("window_shape") is None
        and kwargs.get("mask") is None
    ):
        return True
    return kwargs.get("algorithm", "msclean") in (
        "hogbom", "msclean", "msmfsclean", "mfsmsclean", "mmclean"
    )


def _predict_model(
    vis, model, components, context, model_nonzero=None, **kwargs
):
    mvis = vis.replace(vis=zeros_like_safe(vis.vis))
    if model_nonzero is None:
        model_nonzero = model is not None and bool(
            jnp.max(jnp.abs(model.pixels)) > 0.0
        )
    if model is not None and model_nonzero:
        mvis = predict_visibility(mvis, model, context=context, **kwargs)
    if components is not None and components.ncomp > 0:
        cvis = dft_skycomponent_visibility(
            vis.replace(vis=zeros_like_safe(vis.vis)), components
        )
        mvis = mvis.replace(vis=mvis.vis + cvis.vis)
    return mvis


def continuum_imaging(
    vis: Visibility,
    model: Image,
    nmajor: int = 5,
    context: str = "ng",
    components: Optional[SkyComponents] = None,
    **kwargs,
):
    """Major/minor-cycle CLEAN imaging without self-calibration.

    :return: (deconvolved model Image, residual Image, restored Image)
    """
    ikw = _imaging_kwargs(kwargs)
    fused = kwargs.pop("fused", None)
    ikw["plan"] = _plan_for(
        vis, model, context, ikw, kwargs.pop("use_plan", None)
    )
    psf, _ = invert_visibility(
        vis, model, dopsf=True, context=context, **ikw
    )
    _alg = kwargs.get("algorithm", "msclean")
    can_fuse = (
        ikw.get("plan") is not None
        and _window_fusable(kwargs)
        and (
            _alg in ("hogbom", "msclean")
            or (
                _alg in ("msmfsclean", "mfsmsclean", "mmclean")
                and model.nchan > 2 * (kwargs.get("nmoment", 3) - 1)
            )
        )
    )
    if fused is None:
        fused = can_fuse
    if fused and not can_fuse:
        log.warning(
            "continuum_imaging: fused=True requested but this "
            "configuration is not fusable (plan=%s, algorithm=%r, "
            "window=%r) — falling back to the composed path",
            ikw.get("plan") is not None,
            _alg,
            kwargs.get("window_shape"),
        )
    if fused and can_fuse:
        # ONE dispatch per major cycle (see _fused_selfcal_cycle); the
        # calibration leg is compiled out with do_cal=False
        ws = _FusedSelfCal(
            vis, model, ikw["plan"], components,
            ["T"], create_calibration_controls(), None, 1, 1e-6, psf,
            **kwargs,
        )
        st = ws.state(
            (ws.gt0s[0].weight,), (ws.gt0s[0].residual,)
        )
        cycle_fn = (
            _fused_selfcal_cycle_cube
            if ws.cfg.nchan > 1
            else _fused_selfcal_cycle
        )
        model_px = jnp.zeros_like(model.pixels).astype(jnp.float32)
        gains = (ws.gt0s[0].gain,)
        res_px = None
        for cycle in range(nmajor):
            model_px, _, _, _, res_px, _, peak = cycle_fn(
                st,
                model_px,
                gains,
                cfg=ws.cfg,
                do_cal=(False,),
                with_model=cycle > 0,
            )
            if log.isEnabledFor(logging.INFO):
                # float(peak) is a device->host fetch; only pay it when
                # the log line is actually emitted
                log.info(
                    "continuum_imaging[fused]: cycle %d peak residual %.6f",
                    cycle,
                    float(peak),
                )
        current = model.replace(
            pixels=model_px.astype(model.pixels.dtype)
        )
        residual = model.replace(pixels=res_px)
        restored = _restore_with_components(
            current, psf, residual, components
        )
        return current, residual, restored
    current = model.replace(pixels=jnp.zeros_like(model.pixels))
    residual = None
    ws = (
        _SortedWorkspace(vis, model, ikw["plan"], components)
        if ikw.get("plan") is not None
        else None
    )
    for cycle in range(nmajor):
        if ws is not None:
            # sorted-domain major cycle: no per-cycle value sorts
            residual, _ = ws.residual_invert(
                model, current, model_nonzero=cycle > 0
            )
        else:
            mvis = _predict_model(
                vis, current, components, context,
                model_nonzero=cycle > 0, **ikw
            )
            rvis = subtract_visibility(vis, mvis)
            residual, _ = invert_visibility(
                rvis, model, context=context, **ikw
            )
        comp, _ = deconvolve_cube(residual, psf, **kwargs)
        current = current.replace(pixels=current.pixels + comp.pixels)
        if log.isEnabledFor(logging.INFO):
            log.info(
                "continuum_imaging: cycle %d peak residual %.6f",
                cycle,
                float(jnp.max(jnp.abs(residual.pixels))),
            )
    restored = _restore_with_components(current, psf, residual, components)
    return current, residual, restored


def ical(
    vis: Visibility,
    model: Image,
    components: Optional[SkyComponents] = None,
    nmajor: int = 5,
    calibration_context: str = "T",
    controls: Optional[dict] = None,
    context: str = "ng",
    checkpoint_path: Optional[str] = None,
    state: Optional[SelfCalState] = None,
    **kwargs,
):
    """ICAL: iterative calibration + imaging self-cal loop (SURVEY.md §3.5).

    :return: (model Image, residual Image, restored Image, gaintables dict)
    """
    if controls is None:
        controls = create_calibration_controls()
    ikw = _imaging_kwargs(kwargs)
    fused = kwargs.pop("fused", None)
    ikw["plan"] = _plan_for(
        vis, model, context, ikw, kwargs.pop("use_plan", None)
    )
    psf, _ = invert_visibility(
        vis, model, dopsf=True, context=context, **ikw
    )
    can_fuse = (
        ikw.get("plan") is not None
        and vis.npol == model.npol
        and (
            vis.npol == 1
            or vis.polarisation_frame == model.polarisation_frame
        )
        and all(
            controls[c]["shape"] in ("scalar", "vector")
            # full-Jones terms fuse on npol-4 single-plan configs (the
            # Mueller residual leg is per-plan; cube lanes compose)
            or (
                controls[c]["shape"] == "matrix"
                and vis.npol == 4
                and model.nchan == 1
            )
            for c in calibration_context
        )
        and _window_fusable(kwargs)
        and (
            kwargs.get("algorithm", "msclean") in ("hogbom", "msclean")
            or (
                kwargs.get("algorithm") in (
                    "msmfsclean", "mfsmsclean", "mmclean"
                )
                and model.nchan > 2 * (kwargs.get("nmoment", 3) - 1)
            )
        )
    )
    if fused is None:
        fused = can_fuse
    if fused and not can_fuse:
        log.warning(
            "ical: fused=True requested but this configuration is not "
            "fusable (plan=%s, algorithm=%r, window=%r, context=%r, "
            "npol=%d/%d) — falling back to the composed path",
            ikw.get("plan") is not None,
            kwargs.get("algorithm", "msclean"),
            kwargs.get("window_shape"),
            calibration_context,
            vis.npol,
            model.npol,
        )
    if fused and can_fuse:
        return _ical_fused(
            vis,
            model,
            components,
            nmajor,
            calibration_context,
            controls,
            ikw,
            psf,
            checkpoint_path,
            state,
            **kwargs,
        )
    if state is not None:
        current, gaintables, start = state.model, state.gaintables, state.cycle
    else:
        current = model.replace(pixels=jnp.zeros_like(model.pixels))
        gaintables = None
        start = 0
    cvis = vis
    residual = None
    for cycle in range(start, nmajor):
        # the model is nonzero once at least one minor cycle has added
        # components (resume states with cycle>0 included) — tracked
        # host-side to avoid a device round-trip per cycle
        mvis = _predict_model(
            vis, current, components, context,
            model_nonzero=cycle > 0, **ikw
        )
        cvis, gaintables = calibrate_chain(
            vis,
            mvis,
            gaintables=gaintables,
            calibration_context=calibration_context,
            controls=controls,
            iteration=cycle,
        )
        rvis = subtract_visibility(cvis, mvis)
        residual, _ = invert_visibility(
            rvis, model, context=context, **ikw
        )
        comp, _ = deconvolve_cube(residual, psf, **kwargs)
        current = current.replace(pixels=current.pixels + comp.pixels)
        if log.isEnabledFor(logging.INFO):
            log.info(
                "ical: cycle %d peak residual %.6f",
                cycle,
                float(jnp.max(jnp.abs(residual.pixels))),
            )
        if checkpoint_path is not None:
            SelfCalState(current, gaintables, cycle + 1).save(
                checkpoint_path
            )
    restored = _restore_with_components(current, psf, residual, components)
    return current, residual, restored, gaintables


def _ical_fused(
    vis,
    model,
    components,
    nmajor,
    terms: str,
    controls,
    ikw,
    psf,
    checkpoint_path,
    state,
    solver_niter: int = 200,
    tol: float = 1e-6,
    **kwargs,
):
    """Fused-cycle ICAL driver: one compiled program — and one device
    dispatch — per major cycle (see :func:`_fused_selfcal_cycle`)."""
    ws = _FusedSelfCal(
        vis,
        model,
        ikw["plan"],
        components,
        list(terms),
        controls,
        "mean",
        solver_niter,
        tol,
        psf,
        **kwargs,
    )
    if state is not None:
        current, start = state.model, state.cycle
        gains = tuple(state.gaintables[t].gain for t in terms)
        gwts = tuple(state.gaintables[t].weight for t in terms)
        gress = tuple(state.gaintables[t].residual for t in terms)
    else:
        current, start = model.replace(
            pixels=jnp.zeros_like(model.pixels)
        ), 0
        gains = tuple(gt.gain for gt in ws.gt0s)
        gwts = tuple(gt.weight for gt in ws.gt0s)
        gress = tuple(gt.residual for gt in ws.gt0s)
    st = ws.state(gwts, gress)
    cycle_fn = (
        _fused_selfcal_cycle_cube
        if ws.cfg.nchan > 1
        else _fused_selfcal_cycle
    )
    model_px = current.pixels.astype(jnp.float32)
    res_px = None
    for cycle in range(start, nmajor):
        do_cal = tuple(
            cycle >= t.first_selfcal for t in ws.cfg.terms
        )
        model_px, gains, gwts, gress, res_px, _, peak = cycle_fn(
            st,
            model_px,
            gains,
            cfg=ws.cfg,
            do_cal=do_cal,
            with_model=cycle > 0,
        )
        if log.isEnabledFor(logging.INFO):
            log.info(
                "ical[fused]: cycle %d peak residual %.6f",
                cycle,
                float(peak),
            )
        if checkpoint_path is not None:
            SelfCalState(
                current.replace(pixels=model_px),
                ws.gaintables(gains, gwts, gress),
                cycle + 1,
            ).save(checkpoint_path)
    current = current.replace(pixels=model_px.astype(current.pixels.dtype))
    residual = (
        model.replace(pixels=res_px) if res_px is not None else None
    )
    gaintables = ws.gaintables(gains, gwts, gress)
    restored = _restore_with_components(current, psf, residual, components)
    return current, residual, restored, gaintables


def _restore_with_components(current, psf, residual, components):
    """Restore the image model and, when the sky model includes components,
    add them as clean-beam Gaussians (reference pipelines restore both:
    restore_cube + restore_skycomponent)."""
    from .ops.deconvolution import fit_psf
    from .ops.skycomponent_ops import restore_skycomponent

    clean_beam = fit_psf(psf)
    restored = restore_cube(
        current, psf=psf, residual=residual, clean_beam=clean_beam
    )
    if components is not None and components.ncomp > 0:
        restored = restore_skycomponent(restored, components, clean_beam)
    return restored


def _imaging_kwargs(kwargs: dict) -> dict:
    """Split imaging-relevant kwargs from clean kwargs."""
    keys = ("support", "nw", "do_wstacking")
    return {k: kwargs[k] for k in keys if k in kwargs}


def _plan_for(vis, model, context, ikw, use_plan=None):
    """One gridding-geometry plan shared by PSF, residual inverts, and
    model predicts across all major cycles (uvw never change).

    Defaults to TPU only: the plan path runs the fused Pallas kernels,
    which on CPU would fall back to slow interpret mode."""
    if use_plan is None:
        import jax

        use_plan = jax.default_backend() != "cpu"
    if not use_plan or context == "awprojection":
        return None
    return make_visibility_plan(vis, model, context=context, **ikw)
