"""SkyModel predict / invert — the body of a self-cal major cycle
(framework L4, C26).

Equivalents of /root/reference/src/ska_sdp_func_python/sky_model/
skymodel_imaging.py: model -> vis combines a component DFT and an image FFT
predict, with optional per-time primary beams, masks and calibration; vis ->
image is a PB-weighted invert with flat accumulation.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import zeros_like_safe

from ..models.components import SkyModel
from ..models.visibility import Visibility
from .dft import dft_skycomponent_visibility
from .gain_ops import apply_gaintable
from .imaging import invert_visibility, predict_visibility
from .skycomponent_ops import apply_beam_to_skycomponent
from .visibility_ops import concatenate_visibility

__all__ = ["skymodel_predict_calibrate", "skymodel_calibrate_invert"]


def _mask_image(image, mask, pb=None):
    pixels = image.pixels
    if mask is not None:
        pixels = pixels * jnp.asarray(mask)
    if pb is not None:
        pixels = pixels * pb.pixels
    return image.replace(pixels=pixels)


def _time_slices(vis: Visibility):
    """Yield single-integration Visibility slices (groupby time)."""
    for t in range(vis.ntimes):
        yield vis.replace(
            vis=vis.vis[t : t + 1],
            weight=vis.weight[t : t + 1],
            imaging_weight=vis.imaging_weight[t : t + 1],
            flags=vis.flags[t : t + 1],
            uvw=vis.uvw[t : t + 1],
            time=vis.time[t : t + 1],
            integration_time=vis.integration_time[t : t + 1],
        )


def skymodel_predict_calibrate(
    bvis: Visibility,
    skymodel: SkyModel,
    context: str = "ng",
    docal: bool = False,
    inverse: bool = True,
    get_pb=None,
    **kwargs,
) -> Visibility:
    """Predict visibility for a SkyModel (components DFT + image FFT),
    optionally weighted by a per-time primary beam and calibrated
    (skymodel_imaging.py:70-151)."""

    def predict_slice(vslice, pb=None):
        v = vslice.replace(vis=zeros_like_safe(vslice.vis))
        comps = skymodel.components
        if comps is not None and comps.ncomp > 0:
            if skymodel.mask is not None:
                mask_im = skymodel.image.replace(
                    pixels=jnp.broadcast_to(
                        jnp.asarray(skymodel.mask),
                        skymodel.image.pixels.shape,
                    )
                )
                comps = apply_beam_to_skycomponent(comps, mask_im)
            if pb is not None:
                comps = apply_beam_to_skycomponent(comps, pb)
            v = dft_skycomponent_visibility(v, comps)
        if skymodel.image is not None and bool(
            jnp.max(jnp.abs(skymodel.image.pixels)) > 0.0
        ):
            model = _mask_image(skymodel.image, skymodel.mask, pb)
            imgv = predict_visibility(
                vslice.replace(vis=zeros_like_safe(vslice.vis)),
                model,
                context=context,
                **kwargs,
            )
            v = v.replace(vis=v.vis + imgv.vis)
        return v

    if get_pb is not None:
        slices = []
        for vslice in _time_slices(bvis):
            pb = get_pb(vslice, skymodel.image)
            slices.append(predict_slice(vslice, pb=pb))
        v = concatenate_visibility(slices, "time")
    else:
        v = predict_slice(bvis)

    if docal and skymodel.gaintable is not None:
        v = apply_gaintable(v, skymodel.gaintable, inverse=inverse)
    return v


def skymodel_calibrate_invert(
    bvis: Visibility,
    skymodel: SkyModel,
    context: str = "ng",
    docal: bool = False,
    get_pb=None,
    normalise: bool = True,
    flat_sky: bool = False,
    **kwargs,
):
    """Calibrate then invert, accumulating primary-beam flats
    (skymodel_imaging.py:154-235). Returns (dirty Image, flats)."""
    if skymodel.image is None:
        raise ValueError("skymodel image is None")
    vis = bvis
    if docal and skymodel.gaintable is not None:
        vis = apply_gaintable(vis, skymodel.gaintable)

    if get_pb is None:
        dirty, sumwt = invert_visibility(
            vis, skymodel.image, context=context, normalise=normalise, **kwargs
        )
        if skymodel.mask is not None:
            dirty = dirty.replace(
                pixels=dirty.pixels * jnp.asarray(skymodel.mask)
            )
        return dirty, sumwt

    sum_dirty = jnp.zeros_like(skymodel.image.pixels)
    sum_flats = jnp.zeros_like(skymodel.image.pixels)
    for vslice in _time_slices(vis):
        pb = get_pb(vslice, skymodel.image)
        dirty, sumwt = invert_visibility(
            vslice, skymodel.image, context=context, normalise=False, **kwargs
        )
        flat = jnp.ones_like(dirty.pixels)
        if skymodel.mask is not None:
            flat = flat * jnp.asarray(skymodel.mask)
        if pb is not None:
            flat = flat * pb.pixels
        sum_dirty = sum_dirty + flat * dirty.pixels
        sum_flats = sum_flats + flat * flat * jnp.asarray(sumwt)[
            :, :, None, None
        ]
    out = skymodel.image.replace(pixels=sum_dirty)
    if normalise:
        if flat_sky:
            ok = jnp.sqrt(sum_flats) > 0.0
            out = out.replace(
                pixels=jnp.where(
                    ok,
                    out.pixels / jnp.where(ok, jnp.sqrt(sum_flats), 1.0),
                    0.0,
                )
            )
        else:
            ok = sum_flats > 0.0
            out = out.replace(
                pixels=jnp.where(
                    ok, out.pixels / jnp.where(ok, sum_flats, 1.0), 0.0
                )
            )
        sum_flats = jnp.sqrt(sum_flats)
    return out, skymodel.image.replace(pixels=sum_flats)
