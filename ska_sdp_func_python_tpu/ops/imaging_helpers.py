"""Invert/predict reduction helpers (framework L3, C23).

Equivalents of /root/reference/src/ska_sdp_func_python/imaging/
imaging_helpers.py — these are the reductions a distributed pipeline psums
over the mesh (see parallel/).
"""

from __future__ import annotations

import jax.numpy as jnp

from .imaging import normalise_sumwt
from .taylor import calculate_image_frequency_moments

__all__ = [
    "sum_invert_results",
    "remove_sumwt",
    "sum_predict_results",
    "threshold_list",
]


def sum_invert_results(image_list):
    """Sumwt-weighted sum of (image, sumwt) pairs
    (imaging_helpers.py:25-58)."""
    if len(image_list) == 1:
        return image_list[0][0], image_list[0][1]
    im0 = image_list[0][0]
    pixels = jnp.zeros_like(im0.pixels)
    sumwt = jnp.zeros_like(jnp.asarray(image_list[0][1]))
    for item in image_list:
        if item is None:
            continue
        img, swt = item
        swt = jnp.asarray(swt)
        pixels = pixels + swt[..., None, None] * img.pixels
        sumwt = sumwt + swt
    return normalise_sumwt(im0.replace(pixels=pixels), sumwt), sumwt


def remove_sumwt(results):
    """[(image, sumwt), ...] -> [image, ...] (imaging_helpers.py:61-72)."""
    return [d[0] for d in results]


def sum_predict_results(results):
    """Sum the visibilities of a list of predict results
    (imaging_helpers.py:75-93)."""
    total = None
    for result in results:
        if result is None:
            continue
        if total is None:
            total = result
        else:
            total = total.replace(vis=total.vis + result.vis)
    return total


def threshold_list(
    imagelist,
    threshold: float,
    fractional_threshold: float,
    use_moment0: bool = True,
):
    """Actual minor-cycle threshold over a list of images
    (imaging_helpers.py:96-150)."""
    peak = 0.0
    for result in imagelist:
        if use_moment0:
            moments = calculate_image_frequency_moments(result)
            this_peak = float(
                jnp.max(
                    jnp.abs(moments.pixels[0] / result.pixels.shape[0])
                )
            )
        else:
            ref_chan = result.pixels.shape[0] // 2
            this_peak = float(jnp.max(jnp.abs(result.pixels[ref_chan])))
        peak = max(peak, this_peak)
    return max(peak * fractional_threshold, threshold)
