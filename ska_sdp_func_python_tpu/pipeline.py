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
from typing import Optional

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

    def residual_invert(self, template: Image, current: Image | None):
        """One sort-free major-cycle leg: predict (sorted) -> subtract ->
        invert. Returns the normalised residual Image and sumwt."""
        from .ops.imaging import invert_with_plan, normalise_sumwt

        use_model = current is not None and bool(
            jnp.max(jnp.abs(current.pixels)) > 0.0
        )
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


def _predict_model(vis, model, components, context, **kwargs):
    mvis = vis.replace(vis=zeros_like_safe(vis.vis))
    if model is not None and bool(jnp.max(jnp.abs(model.pixels)) > 0.0):
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
    ikw["plan"] = _plan_for(
        vis, model, context, ikw, kwargs.pop("use_plan", None)
    )
    psf, _ = invert_visibility(
        vis, model, dopsf=True, context=context, **ikw
    )
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
            residual, _ = ws.residual_invert(model, current)
        else:
            mvis = _predict_model(
                vis, current, components, context, **ikw
            )
            rvis = subtract_visibility(vis, mvis)
            residual, _ = invert_visibility(
                rvis, model, context=context, **ikw
            )
        comp, _ = deconvolve_cube(residual, psf, **kwargs)
        current = current.replace(pixels=current.pixels + comp.pixels)
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
    ikw["plan"] = _plan_for(
        vis, model, context, ikw, kwargs.pop("use_plan", None)
    )
    psf, _ = invert_visibility(
        vis, model, dopsf=True, context=context, **ikw
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
        mvis = _predict_model(vis, current, components, context, **ikw)
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
