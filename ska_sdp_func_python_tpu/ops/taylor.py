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
    "calculate_image_list_frequency_moments",
    "calculate_image_list_from_frequency_taylor_terms",
    "calculate_frequency_taylor_terms_from_image_list",
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


# --------------------------------------------------------------------------
# list variants over single-channel images (the reference's channel-list
# decomposition, taylor_terms.py:160-357)
# --------------------------------------------------------------------------


def _gather_image_list(im_list):
    from .image_iterators import image_gather_channels

    return image_gather_channels(list(im_list))


def calculate_image_list_frequency_moments(
    im_list, reference_frequency=None, nmoment: int = 1
) -> Image:
    """List of single-channel images -> one moment Image
    (taylor_terms.py:160-237)."""
    cube = _gather_image_list(im_list)
    return calculate_image_frequency_moments(
        cube, reference_frequency=reference_frequency, nmoment=nmoment
    )


def calculate_image_list_from_frequency_taylor_terms(
    im_list, moment_image: Image, reference_frequency=None
):
    """Reconstruct each single-channel image in a list from a moment cube
    (taylor_terms.py:240-288)."""
    frequency = np.array(
        [float(np.asarray(d.frequency)[0]) for d in im_list]
    )
    if reference_frequency is None:
        reference_frequency = frequency[len(frequency) // 2]
    nmoment = moment_image.pixels.shape[0]
    out = []
    for chan, im in enumerate(im_list):
        w = moment_weights(
            im.frequency, reference_frequency, nmoment
        )  # [1, nmoment]
        data = jnp.einsum(
            "cm,mpyx->cpyx",
            w.astype(moment_image.pixels.dtype),
            moment_image.pixels,
        )
        out.append(im.replace(pixels=data))
    return out


def calculate_frequency_taylor_terms_from_image_list(
    im_list, nmoment: int = 1, reference_frequency=None
):
    """Least-squares Taylor decomposition of a list of single-channel
    images; returns one single-"channel" Image per moment
    (taylor_terms.py:291-357)."""
    cube = _gather_image_list(im_list)
    moments = calculate_frequency_taylor_terms_from_image(
        cube, nmoment=nmoment, reference_frequency=reference_frequency
    )
    frequency = np.asarray(cube.frequency)
    if reference_frequency is None:
        reference_frequency = frequency[len(frequency) // 2]
    return [
        im_list[0].replace(
            pixels=moments.pixels[m : m + 1],
            frequency=jnp.asarray([reference_frequency]),
        )
        for m in range(nmoment)
    ]
