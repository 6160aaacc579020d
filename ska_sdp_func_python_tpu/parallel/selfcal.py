"""Distributed self-calibration major-cycle loop (framework M6; the
BASELINE north star: gain solve + invert/predict + CLEAN with visibilities
sharded over the mesh).

Per major cycle, with visibility rows sharded over the "data" axis:

    model vis   = distributed_predict(model image) + DFT(components)
    gaintable   = distributed_solve_gaintable (psum normal equations)
    corrected   = apply_gaintable(inverse)            [row-local]
    residual    = corrected - model vis               [row-local]
    dirty       = distributed_invert (psum dirty image)
    model      += deconvolve(dirty, psf)              [replicated CLEAN]

The only collectives are the psums inside solve/invert; everything else is
embarrassingly row-parallel, so scaling is bounded by the dirty-image psum.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax.numpy as jnp

from ..config import zeros_like_safe
from jax.sharding import Mesh

from ..models.components import SkyComponents
from ..models.image import Image
from ..models.visibility import Visibility
from ..ops.deconvolution import deconvolve_cube, restore_cube
from ..ops.dft import dft_skycomponent_visibility
from ..ops.gain_ops import apply_gaintable
from .distributed import (
    distributed_invert,
    distributed_predict,
    distributed_solve_gaintable,
)

log = logging.getLogger("ska-sdp-func-python-tpu")

__all__ = ["distributed_ical"]


def distributed_ical(
    vis: Visibility,
    model: Image,
    mesh: Mesh,
    components: Optional[SkyComponents] = None,
    nmajor: int = 5,
    axis: str = "data",
    phase_only: bool = True,
    jones_type: str = "T",
    timeslice=None,
    support: int = 8,
    nw: int = 1,
    do_wstacking: bool = False,
    **clean_kwargs,
):
    """Distributed ICAL over a device mesh.

    :return: (model Image, residual Image, restored Image, GainTable)
    """
    psf, _ = distributed_invert(
        vis,
        model,
        mesh,
        axis=axis,
        dopsf=True,
        support=support,
        nw=nw,
        do_wstacking=do_wstacking,
    )
    current = model.replace(pixels=jnp.zeros_like(model.pixels))
    residual = None
    gt = None
    for cycle in range(nmajor):
        mvis = vis.replace(vis=zeros_like_safe(vis.vis))
        if bool(jnp.max(jnp.abs(current.pixels)) > 0.0):
            mvis = distributed_predict(
                mvis,
                current,
                mesh,
                axis=axis,
                support=support,
                nw=nw,
                do_wstacking=do_wstacking,
            )
        if components is not None and components.ncomp > 0:
            cvis = dft_skycomponent_visibility(
                vis.replace(vis=zeros_like_safe(vis.vis)), components
            )
            mvis = mvis.replace(vis=mvis.vis + cvis.vis)
        gt = distributed_solve_gaintable(
            vis,
            mvis,
            mesh,
            axis=axis,
            phase_only=phase_only,
            jones_type=jones_type,
            timeslice=timeslice,
        )
        corrected = apply_gaintable(vis, gt, inverse=True)
        rvis = corrected.replace(vis=corrected.vis - mvis.vis)
        residual, _ = distributed_invert(
            rvis,
            model,
            mesh,
            axis=axis,
            support=support,
            nw=nw,
            do_wstacking=do_wstacking,
        )
        comp, _ = deconvolve_cube(residual, psf, **clean_kwargs)
        current = current.replace(pixels=current.pixels + comp.pixels)
        if log.isEnabledFor(logging.INFO):
            log.info(
                "distributed_ical: cycle %d peak residual %.6f",
                cycle,
                float(jnp.max(jnp.abs(residual.pixels))),
            )
    restored = restore_cube(current, psf=psf, residual=residual)
    return current, residual, restored, gt
