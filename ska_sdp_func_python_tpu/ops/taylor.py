"""Frequency moment / Taylor-term machinery (framework L3, C21/C25).

Equivalents of /root/reference/src/ska_sdp_func_python/image/taylor_terms.py,
cube-first: the reference loops over moments and channels in python
(taylor_terms.py:73-80); here the channel<->moment maps are single einsums
against a [nchan, nmoment] weight matrix (MXU-friendly).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.image import Image

__all__ = [
    "moment_weights",
    "calculate_image_frequency_moments",
    "calculate_image_from_frequency_taylor_terms",
    "calculate_frequency_taylor_terms_from_image",
]


def moment_weights(frequency, reference_frequency=None, nmoment: int = 1):
    """w[chan, k] = ((nu_chan - nu_ref)/nu_ref)^k."""
    frequency = jnp.asarray(frequency)
    nchan = frequency.shape[0]
    if reference_frequency is None:
        reference_frequency = frequency[nchan // 2]
    x = (frequency - reference_frequency) / reference_frequency
    return x[:, None] ** jnp.arange(nmoment)[None, :]


def calculate_image_frequency_moments(
    im: Image, reference_frequency=None, nmoment: int = 1
) -> Image:
    """Channel cube -> frequency-moment cube (taylor_terms.py:22-99).

    The spectral axis is replaced by a moment axis.
    """
    nchan = im.nchan
    if nmoment > nchan:
        raise ValueError(
            f"Number of moments {nmoment} cannot exceed channels {nchan}"
        )
    w = moment_weights(im.frequency, reference_frequency, nmoment)
    moment_data = jnp.einsum("cm,cpyx->mpyx", w.astype(im.pixels.dtype), im.pixels)
    return im.replace(pixels=moment_data)


def calculate_image_from_frequency_taylor_terms(
    im: Image, taylor_terms_image: Image, reference_frequency=None
) -> Image:
    """Moment/Taylor cube -> channel cube on ``im``'s frequency grid
    (taylor_terms.py:102-157)."""
    nmoment = taylor_terms_image.pixels.shape[0]
    w = moment_weights(im.frequency, reference_frequency, nmoment)
    data = jnp.einsum(
        "cm,mpyx->cpyx",
        w.astype(taylor_terms_image.pixels.dtype),
        taylor_terms_image.pixels,
    )
    return im.replace(pixels=data)


def calculate_frequency_taylor_terms_from_image(
    im: Image, nmoment: int = 1, reference_frequency=None, rcond: float = 1e-7
) -> Image:
    """Least-squares decoupling of a channel cube into Taylor terms via the
    pseudo-inverse of the channel-moment coupling
    (taylor_terms.py:291-357)."""
    w = moment_weights(im.frequency, reference_frequency, nmoment)
    pinv = jnp.linalg.pinv(w, rcond=rcond)  # [nmoment, nchan]
    data = jnp.einsum("mc,cpyx->mpyx", pinv.astype(im.pixels.dtype), im.pixels)
    return im.replace(pixels=data)
