"""Image polarisation/beam conversions (framework L3, C16).

Equivalents of /root/reference/src/ska_sdp_func_python/image/operations.py on
the pytree Image model.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.image import Image
from ..models.polarisation import (
    convert_circular_to_stokes,
    convert_linear_to_stokes,
    convert_stokes_to_circular,
    convert_stokes_to_linear,
)

__all__ = [
    "convert_clean_beam_to_degrees",
    "convert_clean_beam_to_pixels",
    "convert_stokes_to_polimage",
    "convert_polimage_to_stokes",
]

_TO_MM = np.sqrt(8.0 * np.log(2.0))  # sigma -> FWHM


def convert_clean_beam_to_degrees(im: Image, beam_pixels) -> dict:
    """(sigma_x_pix, sigma_y_pix, theta_rad) -> {bmaj, bmin, bpa} in degrees
    (image/operations.py:32-55)."""
    cellsize = im.cellsize
    b0, b1, b2 = (float(b) for b in beam_pixels)
    if b1 > b0:
        return {
            "bmaj": np.rad2deg(b1 * cellsize * _TO_MM),
            "bmin": np.rad2deg(b0 * cellsize * _TO_MM),
            "bpa": np.rad2deg(b2),
        }
    return {
        "bmaj": np.rad2deg(b0 * cellsize * _TO_MM),
        "bmin": np.rad2deg(b1 * cellsize * _TO_MM),
        "bpa": np.rad2deg(b2) + 90.0,
    }


def convert_clean_beam_to_pixels(model: Image, clean_beam: dict):
    """{bmaj, bmin, bpa} degrees -> (sigma_x, sigma_y, theta) in pixels/rad
    (image/operations.py:58-75)."""
    cellsize = model.cellsize
    return (
        np.deg2rad(clean_beam["bmin"]) / (cellsize * _TO_MM),
        np.deg2rad(clean_beam["bmaj"]) / (cellsize * _TO_MM),
        np.deg2rad(clean_beam["bpa"]),
    )


def convert_stokes_to_polimage(im: Image, polarisation_frame) -> Image:
    """Stokes cube -> complex correlation-frame image
    (image/operations.py:78-132)."""
    frame = getattr(polarisation_frame, "name", str(polarisation_frame))
    if frame in ("linear", "linearnp"):
        data = convert_stokes_to_linear(im.pixels, polaxis=1)
    elif frame in ("circular", "circularnp"):
        data = convert_stokes_to_circular(im.pixels, polaxis=1)
    elif frame == "stokesI":
        data = im.pixels.astype(
            jnp.result_type(im.pixels.dtype, jnp.complex64)
        )
    else:
        raise ValueError(f"Cannot convert stokes to {frame}")
    return im.replace(pixels=data, polarisation_frame=frame)


def convert_polimage_to_stokes(im: Image, complex_image: bool = False) -> Image:
    """Complex correlation-frame image -> Stokes
    (image/operations.py:135-196)."""
    frame = im.polarisation_frame
    if frame == "linear":
        data, new_frame = convert_linear_to_stokes(im.pixels, polaxis=1), "stokesIQUV"
    elif frame == "linearnp":
        data, new_frame = convert_linear_to_stokes(im.pixels, polaxis=1), "stokesIQ"
    elif frame == "circular":
        data, new_frame = convert_circular_to_stokes(im.pixels, polaxis=1), "stokesIQUV"
    elif frame == "circularnp":
        data, new_frame = convert_circular_to_stokes(im.pixels, polaxis=1), "stokesIV"
    elif frame == "stokesI":
        data, new_frame = im.pixels, "stokesI"
    else:
        raise ValueError(f"Cannot convert {frame} to stokes")
    if not complex_image:
        data = jnp.real(data)
    return im.replace(pixels=data, polarisation_frame=new_frame)
