"""Image facet/channel iterators and scatter/gather (framework L3, C19/C20).

Equivalents of /root/reference/src/ska_sdp_func_python/image/iterators.py and
image/gather_scatter.py — the reference's data-parallel decomposition
primitives. Facets are produced with overlap and a taper (flat / linear /
quadratic / tukey, iterators.py:140-189); gathering normalises by the
accumulated taper flats (gather_scatter.py:90-147). In the TPU framework
these map onto 2-D mesh sharding of the image plane (see parallel/); the
list-based API is kept for reference parity.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from ..models.image import Image
from ..utils.arrays import tukey_filter

__all__ = [
    "image_raster_iter",
    "image_channel_iter",
    "image_scatter_facets",
    "image_gather_facets",
    "image_scatter_channels",
    "image_gather_channels",
]


def _facet_slices(npixel: int, facets: int, overlap: int):
    """Start/stop pixel ranges of each facet along one axis."""
    step = npixel // facets
    slices = []
    for i in range(facets):
        lo = max(0, i * step - overlap)
        hi = min(npixel, (i + 1) * step + overlap)
        slices.append((lo, hi))
    return slices


def _taper_1d(width: int, overlap: int, taper: str):
    """Taper weights across one facet axis (iterators.py:140-189)."""
    w = np.ones(width)
    if overlap <= 0 or taper in (None, "flat"):
        return jnp.asarray(w)
    ramp = np.arange(1, overlap + 1) / (overlap + 1.0)
    if taper == "linear":
        pass
    elif taper == "quadratic":
        ramp = ramp**2
    elif taper == "tukey":
        x = np.arange(1, overlap + 1) / (2.0 * overlap + 1.0)
        ramp = np.asarray(tukey_filter(jnp.asarray(x), 1.0))
    else:
        raise ValueError(f"Unknown taper {taper}")
    w[:overlap] = ramp
    w[-overlap:] = ramp[::-1]
    return jnp.asarray(w)


def image_raster_iter(
    im: Image,
    facets: int = 1,
    overlap: int = 0,
    taper: str = "flat",
    make_flat: bool = False,
):
    """Yield facet images in raster order (iterators.py:66-190).

    With ``make_flat`` yields the taper-weight images instead.
    """
    ny, nx = im.pixels.shape[-2:]
    if nx % facets or ny % facets:
        raise ValueError("Facets must divide the image size")
    for ylo, yhi in _facet_slices(ny, facets, overlap):
        for xlo, xhi in _facet_slices(nx, facets, overlap):
            sub = im.pixels[..., ylo:yhi, xlo:xhi]
            if make_flat:
                wy = _taper_1d(yhi - ylo, overlap, taper)
                wx = _taper_1d(xhi - xlo, overlap, taper)
                flat = jnp.outer(wy, wx)
                sub = jnp.broadcast_to(
                    flat[None, None], sub.shape
                ).astype(im.pixels.dtype)
            # facet keeps the global phasecentre; its offset is carried by
            # the facet index (the reference adjusts WCS crpix instead)
            yield im.replace(pixels=sub)


def image_channel_iter(im: Image, subimages: int = 1):
    """Yield channel-subset images (iterators.py:193-246)."""
    nchan = im.nchan
    step = nchan // subimages
    for i in range(subimages):
        lo = i * step
        hi = nchan if i == subimages - 1 else (i + 1) * step
        yield im.replace(
            pixels=im.pixels[lo:hi],
            frequency=im.frequency[lo:hi],
            channel_bandwidth=im.channel_bandwidth[lo:hi],
        )


def image_scatter_facets(
    im: Image, facets: int = 1, overlap: int = 0, taper: str = "flat"
) -> List[Image]:
    """(gather_scatter.py:24-50)."""
    return list(
        image_raster_iter(im, facets=facets, overlap=overlap, taper=taper)
    )


def image_gather_facets(
    image_list: List[Image],
    im: Image,
    facets: int = 1,
    overlap: int = 0,
    taper: str = "flat",
    return_flat: bool = False,
) -> Image:
    """Reassemble facets with taper-flat normalisation
    (gather_scatter.py:53-166)."""
    ny, nx = im.pixels.shape[-2:]
    out = jnp.zeros_like(im.pixels)
    flat_sum = jnp.zeros(im.pixels.shape[-2:], dtype=im.pixels.dtype)
    yslices = _facet_slices(ny, facets, overlap)
    xslices = _facet_slices(nx, facets, overlap)
    k = 0
    for ylo, yhi in yslices:
        for xlo, xhi in xslices:
            wy = _taper_1d(yhi - ylo, overlap, taper)
            wx = _taper_1d(xhi - xlo, overlap, taper)
            flat = jnp.outer(wy, wx).astype(im.pixels.dtype)
            out = out.at[..., ylo:yhi, xlo:xhi].add(
                image_list[k].pixels * flat[None, None]
            )
            flat_sum = flat_sum.at[ylo:yhi, xlo:xhi].add(flat)
            k += 1
    if return_flat:
        return im.replace(
            pixels=jnp.broadcast_to(
                flat_sum[None, None], im.pixels.shape
            )
        )
    ok = flat_sum > 0
    out = out / jnp.where(ok, flat_sum, 1.0)[None, None]
    return im.replace(pixels=out)


def image_scatter_channels(im: Image, subimages: int = None) -> List[Image]:
    """(gather_scatter.py:169-185)."""
    if subimages is None:
        subimages = im.nchan
    return list(image_channel_iter(im, subimages=subimages))


def image_gather_channels(image_list: List[Image]) -> Image:
    """(gather_scatter.py:188-194)."""
    return image_list[0].replace(
        pixels=jnp.concatenate([im.pixels for im in image_list], axis=0),
        frequency=jnp.concatenate([im.frequency for im in image_list]),
        channel_bandwidth=jnp.concatenate(
            [im.channel_bandwidth for im in image_list]
        ),
    )


def image_raster_update(
    im: Image,
    fn,
    facets: int = 1,
    overlap: int = 0,
    taper: str = "flat",
) -> Image:
    """Functional writeback form of :func:`image_raster_iter`.

    The reference's raster iterator yields mutable xarray views that
    callers modify IN PLACE (iterators.py:66-190: "If the returned
    images are changed, the changes are reflected in the original
    image"); with immutable jax arrays the same workflow is one call:
    ``fn`` maps each facet Image to its replacement, and the results
    are taper-gathered back onto the full grid.

    >>> out = image_raster_update(im, lambda f: f.replace(
    ...     pixels=f.pixels * 2.0), facets=4, overlap=8, taper="tukey")
    """
    updated = [
        fn(facet)
        for facet in image_raster_iter(
            im, facets=facets, overlap=overlap, taper=taper
        )
    ]
    return image_gather_facets(
        updated, im, facets=facets, overlap=overlap, taper=taper
    )
