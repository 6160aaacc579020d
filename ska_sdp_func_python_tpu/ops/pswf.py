"""FFT-coordinate helpers, prolate spheroidal wave function and w-beam
(framework L1).

Equivalents of /root/reference/src/ska_sdp_func_python/fourier_transforms/
fft_coordinates.py, vectorised in jnp (the reference's part-wise rational
approximation becomes a branch-free where-select).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "coordinateBounds",
    "coordinates2Offset",
    "coordinate_bounds",
    "coordinates",
    "coordinates2",
    "coordinates2_offset",
    "grdsf",
    "w_beam",
]


def coordinate_bounds(npixel: int):
    """(fft_coordinates.py:18-37)."""
    if npixel % 2 == 0:
        return -0.5, 0.5 * (npixel - 2) / npixel
    return -0.5 * (npixel - 1) / npixel, 0.5 * (npixel - 1) / npixel


def coordinates(npixel: int):
    """1-D array spanning [-0.5, 0.5) with 0 at ``npixel//2``
    (fft_coordinates.py:40-47)."""
    return (jnp.arange(npixel) - npixel // 2) / npixel


def coordinates2(npixel: int):
    """2-D (y, x) coordinate grids with 0 at ``npixel//2``
    (fft_coordinates.py:50-59). Returns stacked [2, n, n]."""
    iy = (jnp.arange(npixel) - npixel // 2) / npixel
    ix = (jnp.arange(npixel) - npixel // 2) / npixel
    return jnp.stack(jnp.meshgrid(iy, ix, indexing="ij"))


def coordinates2_offset(npixel: int, cx, cy, quadrant: bool = False):
    """Coordinate grids centred on (cx, cy) (fft_coordinates.py:62-84)."""
    if cx is None:
        cx = npixel // 2
    if cy is None:
        cy = npixel // 2
    n = npixel // 2 + 1 if quadrant else npixel
    my = jnp.arange(n)[:, None]
    mx = jnp.arange(n)[None, :]
    return (my - cy) / npixel, (mx - cx) / npixel


# Schwab 'Indirect Imaging' rational-approximation coefficients, m=6 alpha=1
_P = np.array(
    [
        [8.203343e-2, -3.644705e-1, 6.278660e-1, -5.335581e-1, 2.312756e-1],
        [4.028559e-3, -3.697768e-2, 1.021332e-1, -1.201436e-1, 6.412774e-2],
    ]
)
_Q = np.array(
    [
        [1.0000000e0, 8.212018e-1, 2.078043e-1],
        [1.0000000e0, 9.599102e-1, 2.918724e-1],
    ]
)


def grdsf(nu):
    """Prolate spheroidal wave function (anti-aliasing kernel), Schwab
    rational approximation (fft_coordinates.py:87-156).

    :param nu: distance to edge, |nu| <= 1 for nonzero result
    :return: (gridding function, grid-correction function (1-nu^2)*grdsf)
    """
    nu = jnp.abs(jnp.asarray(nu))
    inner = nu < 0.75
    nuend = jnp.where(inner, 0.75, 1.0)
    delnusq = nu**2 - nuend**2

    def poly(coeffs):
        # evaluate per-part polynomials in delnusq, select by part
        val0 = jnp.zeros_like(nu)
        val1 = jnp.zeros_like(nu)
        for k in range(coeffs.shape[1]):
            val0 = val0 + coeffs[0, k] * delnusq**k
            val1 = val1 + coeffs[1, k] * delnusq**k
        return jnp.where(inner, val0, val1)

    top = poly(jnp.asarray(_P, dtype=nu.dtype))
    bot = poly(jnp.asarray(_Q, dtype=nu.dtype))
    grdsf_arr = jnp.where(bot > 0.0, top / jnp.where(bot > 0.0, bot, 1.0), 0.0)
    grdsf_arr = jnp.where(nu > 1.0, 0.0, grdsf_arr)
    return grdsf_arr, (1 - nu**2) * grdsf_arr


def w_beam(
    npixel: int,
    field_of_view: float,
    w,
    cx=None,
    cy=None,
    remove_shift: bool = False,
):
    """Fresnel w-beam pattern exp(-2 pi i w (1 - sqrt(1-l^2-m^2)))
    (fft_coordinates.py:159-194).

    Unlike the reference's quadrant-and-reflect trick (a CPU memory saving),
    this evaluates the full grid directly — branch-free and fused under XLA.
    """
    if cx is None:
        cx = npixel // 2
    if cy is None:
        cy = npixel // 2
    my = (jnp.arange(npixel)[:, None] - cy) / npixel
    mx = (jnp.arange(npixel)[None, :] - cx) / npixel
    # mirror-symmetric distances about the delay centre, matching the
    # reference's reflect-padding of the lower-left quadrant
    my = -jnp.abs(my)
    mx = -jnp.abs(mx)
    r2 = field_of_view**2 * (my**2 + mx**2)
    r2c = jnp.minimum(r2, 1.0)
    # stable 1 - sqrt(1-r2) (no cancellation at small r2), and a
    # split-compensated mod-1 product: w spans up to ~1e4 wavelengths so
    # a plain f32 w*(1-sqrt(...)) phase loses |phase|*eps
    from ..config import frac_dot_turns

    g = r2c / (1.0 + jnp.sqrt(1.0 - r2c))
    turns = frac_dot_turns(jnp.asarray(w)[..., None], g[..., None])
    ph = -2.0 * jnp.pi * turns
    ph = jnp.where(r2 >= 1.0, 0.0, ph)
    import jax

    cp = jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
    cp = jnp.where(r2 >= 1.0, cp * 0.0, cp)
    cp = jnp.where(r2 == 0.0, cp * 0.0 + 1.0, cp)
    if remove_shift:
        cp = cp / cp[-1, -1]
    return cp


# reference-style names (fft_coordinates.py:18,66)
coordinateBounds = coordinate_bounds
coordinates2Offset = coordinates2_offset
