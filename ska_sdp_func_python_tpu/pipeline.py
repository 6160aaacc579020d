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
    for cycle in range(nmajor):
        mvis = _predict_model(vis, current, components, context, **ikw)
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
