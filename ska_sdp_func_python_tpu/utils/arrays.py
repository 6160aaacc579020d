"""Array utility functions (framework L1), pure JAX.

Equivalents of /root/reference/src/ska_sdp_func_python/util/array_functions.py,
re-expressed branch-free: the reference's scalar ``tukey_filter`` becomes a
vectorised ``jnp.where`` chain; chunked averaging keeps the masked-matmul
formulation (MXU-friendly).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "average_chunks",
    "average_chunks2",
    "tukey_filter",
    "insert_function_sinc",
    "insert_function_L",
    "insert_function_pswf",
    "insert_array",
]


def average_chunks(arr, wts, chunksize: int):
    """Weighted average of 1-D ``arr`` in chunks (array_functions.py:20-43).

    Length need not be a multiple of ``chunksize``. Returns (avg, wsum).
    """
    arr = jnp.asarray(arr)
    wts = jnp.asarray(wts)
    if chunksize <= 1:
        return arr, wts
    n = arr.shape[0]
    nchunks = (n - 1) // chunksize + 1
    # chunk-membership mask [nchunks, n]: matmul-based reduction
    rows = jnp.arange(nchunks)[:, None]
    cols = jnp.arange(n)[None, :]
    mask = (cols >= rows * chunksize) & (cols < (rows + 1) * chunksize)
    mask_r = mask.astype(wts.dtype)
    chunks = (mask.astype(arr.dtype)) @ (wts.astype(arr.dtype) * arr)
    weights = mask_r @ wts
    avg = jnp.where(weights > 0.0, chunks / jnp.where(weights > 0.0, weights, 1.0), chunks)
    return avg, weights


def average_chunks2(arr, wts, chunksize):
    """2-D chunked weighted averaging (array_functions.py:46-82)."""
    arr = jnp.asarray(arr)
    wts = jnp.asarray(wts).reshape(arr.shape)
    cy, cx = chunksize
    # average along axis 1 then axis 0, carrying weights
    a1, w1 = jnp.vectorize(
        lambda a, w: average_chunks(a, w, cx), signature="(n),(n)->(m),(m)"
    )(arr, wts)
    a1t, w1t = a1.T, w1.T
    a2, w2 = jnp.vectorize(
        lambda a, w: average_chunks(a, w, cy), signature="(n),(n)->(m),(m)"
    )(a1t, w1t)
    return a2.T, w2.T


def tukey_filter(x, r):
    """Tukey (tapered cosine) filter, vectorised (array_functions.py:85-99)."""
    x = jnp.asarray(x)
    lo = 0.5 * (1.0 + jnp.cos(2.0 * jnp.pi * (x - r / 2.0) / r))
    hi = 0.5 * (1.0 + jnp.cos(2.0 * jnp.pi * (x - 1 + r / 2.0) / r))
    out = jnp.ones_like(x)
    out = jnp.where((x >= 0.0) & (x < r / 2.0), lo, out)
    out = jnp.where((x >= 1 - r / 2.0) & (x <= 1.0), hi, out)
    return out


def insert_function_sinc(x):
    x = jnp.asarray(x)
    return jnp.where(x != 0.0, jnp.sinc(x), 0.0)


def insert_function_L(x, a: int = 5):
    return insert_function_sinc(x) * insert_function_sinc(x / a)


def insert_function_pswf(x, a: int = 5):
    from ..ops.pswf import grdsf

    return grdsf(jnp.abs(jnp.asarray(x)) / a)[1]


def insert_array(
    im,
    x,
    y,
    flux,
    bandwidth: float = 1.0,
    support: int = 7,
    insert_function=insert_function_L,
):
    """Insert a point at fractional pixel (x, y) into image cube ``im``
    ``[nchan, npol, ny, nx]`` with an anti-aliased kernel
    (array_functions.py:134-178). Fully jittable via dynamic_update_slice.

    Note: unlike the reference (python int indexing) this uses a static
    ``2*support`` window placed with lax.dynamic_update_slice, so inserts
    near the image edge are clipped rather than wrapped.
    """
    import jax.lax as lax

    im = jnp.asarray(im)
    flux = jnp.asarray(flux)
    intx = jnp.round(x).astype(jnp.int32)
    inty = jnp.round(y).astype(jnp.int32)
    fracx = x - intx
    fracy = y - inty
    grid = jnp.arange(-support, support)
    ky = insert_function(bandwidth * (grid - fracy))
    kx = insert_function(bandwidth * (grid - fracx))
    kernel = jnp.outer(ky, kx)
    kernel = kernel / jnp.sum(kernel)
    patch = flux[:, :, None, None] * kernel[None, None, :, :]
    start_y = inty - support
    start_x = intx - support
    zero = jnp.zeros((), dtype=start_y.dtype)
    # read-modify-write so overlapping inserts accumulate
    cur = lax.dynamic_slice(
        im,
        (zero, zero, start_y, start_x),
        (im.shape[0], im.shape[1], 2 * support, 2 * support),
    )
    return lax.dynamic_update_slice(
        im, cur + patch.astype(im.dtype), (zero, zero, start_y, start_x)
    )
