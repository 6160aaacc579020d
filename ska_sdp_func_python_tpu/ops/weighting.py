"""Imaging weighting and tapering (framework L3, C22).

Equivalents of /root/reference/src/ska_sdp_func_python/imaging/weighting.py
driving the density-grid kernels in ops/gridding.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.image import Image
from ..models.visibility import Visibility
from .gridding import grid_weights_nearest, reweight_imaging_weights

__all__ = [
    "weight_visibility",
    "taper_visibility_gaussian",
    "taper_visibility_tukey",
]


def _uv_pix(vis: Visibility, template: Image):
    """Fractional uv grid coordinates per (t, b, f) row, flattened per chan.

    Uses the same sign convention as ops/imaging.py.
    """
    npixel = template.npixel
    scale = npixel * template.cellsize
    uvw_l = vis.uvw_lambda  # [T, B, F, 3]
    u_pix = -uvw_l[..., 0] * scale + npixel // 2
    v_pix = uvw_l[..., 1] * scale + npixel // 2
    return u_pix, v_pix


def weight_visibility(
    vis: Visibility,
    model: Image,
    weighting: str = "uniform",
    robustness: float = 0.0,
    **kwargs,
) -> Visibility:
    """Compute imaging weights by uv density (weighting.py:35-68).

    Grids flagged weights per channel-and-pol into a common density grid
    (with conjugate points), then applies uniform/robust reweighting.
    """
    if weighting == "natural":
        return vis.replace(imaging_weight=vis.weight)
    npixel = model.npixel
    u_pix, v_pix = _uv_pix(vis, model)
    fw = vis.flagged_weight  # [T, B, F, P]
    T, B, F, P = fw.shape
    up = u_pix.reshape(-1)
    vp = v_pix.reshape(-1)
    new_imwt = jnp.zeros_like(fw)
    for pol in range(P):
        wts = fw[..., pol].reshape(-1)
        density, sumwt = grid_weights_nearest(up, vp, wts, npixel)
        imwt = reweight_imaging_weights(
            up,
            vp,
            wts,
            density,
            weighting=weighting,
            robustness=robustness,
            sumwt=sumwt,
        )
        new_imwt = new_imwt.at[..., pol].set(imwt.reshape(T, B, F))
    return vis.replace(imaging_weight=new_imwt)


def taper_visibility_gaussian(vis: Visibility, beam: float) -> Visibility:
    """Gaussian uv taper for target beam FWHM ``beam`` rad
    (weighting.py:71-101): wt *= exp(-uv^2 / (2 sigma^2)) with
    sigma = 1/(1.5 beam) in the uv plane."""
    uvw_l = vis.uvw_lambda
    uvdist2 = uvw_l[..., 0] ** 2 + uvw_l[..., 1] ** 2  # [T, B, F]
    # reference scale_factor: -log(0.5)/(uv half-power point)^2 with
    # uv_hp = 4 ln2 / (pi * beam)
    sf = -jnp.log(0.5) / ((4.0 * jnp.log(2.0) / (jnp.pi * beam)) ** 2)
    taper = jnp.exp(-sf * uvdist2)
    return vis.replace(
        imaging_weight=vis.imaging_weight * taper[..., None]
    )


def taper_visibility_tukey(vis: Visibility, tukey: float = 0.1) -> Visibility:
    """Tukey radial taper on normalised uv distance (weighting.py:104-140)."""
    from ..utils.arrays import tukey_filter

    uvw_l = vis.uvw_lambda
    uvdist = jnp.sqrt(uvw_l[..., 0] ** 2 + uvw_l[..., 1] ** 2)
    uvdistmax = jnp.max(uvdist)
    x = uvdist / jnp.where(uvdistmax > 0, uvdistmax, 1.0)
    taper = tukey_filter(x, tukey)
    return vis.replace(
        imaging_weight=vis.imaging_weight * taper[..., None]
    )
