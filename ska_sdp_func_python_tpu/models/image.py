"""Image data model: pytree equivalent of the reference's xarray Image
(``pixels [nchan, npol, ny, nx]`` + astropy WCS; SURVEY.md L0,
/root/reference/src/ska_sdp_func_python/imaging/base.py:299-440).

TPU-first design: the WCS is reduced to the affine SIN-projection parameters
actually used by the hot path (phase centre + cellsize + centre pixel), kept
as plain floats / tiny arrays so pixel<->lm math stays inside jit. Astropy
interop, if ever needed, lives at the host rim only.

Pixel convention (matching the reference's FITS WCS with cdelt1 < 0):
    l = -(ix - nx//2) * cellsize   (RA / l increases right-to-left)
    m = +(iy - ny//2) * cellsize
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Image", "create_image"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "pixels",
        "frequency",
        "channel_bandwidth",
        "phasecentre",
        "clean_beam",
    ],
    meta_fields=["cellsize", "polarisation_frame"],
)
@dataclasses.dataclass
class Image:
    """Canonical 4-axis image: ``pixels [nchan, npol, ny, nx]``.

    ``cellsize`` is in radians (static); ``phasecentre`` = [ra, dec] rad;
    ``clean_beam`` is None or ``[bmaj, bmin, bpa]`` in radians.
    """

    pixels: jax.Array
    frequency: jax.Array
    channel_bandwidth: jax.Array
    phasecentre: jax.Array
    clean_beam: Optional[jax.Array]
    cellsize: float = 0.001
    polarisation_frame: str = "stokesI"

    @property
    def nchan(self) -> int:
        return self.pixels.shape[0]

    @property
    def npol(self) -> int:
        return self.pixels.shape[1]

    @property
    def shape(self):
        return self.pixels.shape

    @property
    def npixel(self) -> int:
        return self.pixels.shape[-1]

    def replace(self, **kwargs) -> "Image":
        return dataclasses.replace(self, **kwargs)

    def with_pixels(self, pixels) -> "Image":
        return dataclasses.replace(self, pixels=pixels)

    # --- affine WCS helpers ---------------------------------------------
    def lm_grids(self):
        """(l, m) direction-cosine grids, each ``[ny, nx]``."""
        ny, nx = self.pixels.shape[-2:]
        ix = jnp.arange(nx) - nx // 2
        iy = jnp.arange(ny) - ny // 2
        l = -ix * self.cellsize
        m = iy * self.cellsize
        return jnp.broadcast_to(l[None, :], (ny, nx)), jnp.broadcast_to(
            m[:, None], (ny, nx)
        )

    def lm_to_pixel(self, l, m):
        """Direction cosines -> fractional pixel (ix, iy)."""
        ny, nx = self.pixels.shape[-2:]
        ix = nx // 2 - l / self.cellsize
        iy = ny // 2 + m / self.cellsize
        return ix, iy

    def pixel_to_lm(self, ix, iy):
        ny, nx = self.pixels.shape[-2:]
        # host f64: pixel positions are astrometry, not device tensors
        # (a device-f32 l costs 2*pi*|uvw|*eps of phase downstream)
        l = -(np.asarray(ix, np.float64) - nx // 2) * self.cellsize
        m = (np.asarray(iy, np.float64) - ny // 2) * self.cellsize
        return l, m

    def radec_to_pixel(self, ra, dec):
        """World (rad) -> fractional pixel via SIN projection."""
        from ..utils.coordinates import radec_to_lmn

        l, m, _ = radec_to_lmn(ra, dec, self.phasecentre[0], self.phasecentre[1])
        return self.lm_to_pixel(l, m)

    def pixel_to_radec(self, ix, iy):
        from ..utils.coordinates import lmn_to_radec

        l, m = self.pixel_to_lm(ix, iy)
        return lmn_to_radec(l, m, self.phasecentre[0], self.phasecentre[1])


def create_image(
    npixel: int,
    cellsize: float,
    phasecentre,
    frequency=None,
    channel_bandwidth=None,
    polarisation_frame: str = "stokesI",
    nchan: int = None,
    npol: int = None,
    dtype=None,
) -> Image:
    """Create an empty canonical image (reference: create_image /
    create_image_from_visibility, imaging/base.py:299-440)."""
    from .polarisation import npol as _frame_npol

    if frequency is None:
        frequency = np.array([1e8])
    frequency = jnp.atleast_1d(jnp.asarray(frequency))
    if channel_bandwidth is None:
        if frequency.shape[0] > 1:
            df = jnp.diff(frequency)
            channel_bandwidth = jnp.concatenate([df, df[-1:]])
        else:
            channel_bandwidth = jnp.full((1,), 1e6, dtype=frequency.dtype)
    else:
        channel_bandwidth = jnp.atleast_1d(jnp.asarray(channel_bandwidth))
    frame = str(
        polarisation_frame.name
        if hasattr(polarisation_frame, "name")
        else polarisation_frame
    )
    nchan = frequency.shape[0] if nchan is None else nchan
    npol = _frame_npol(frame) if npol is None else npol
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return Image(
        pixels=jnp.zeros((nchan, npol, npixel, npixel), dtype=dtype),
        frequency=frequency,
        channel_bandwidth=channel_bandwidth,
        # host numpy f64: astrometric metadata must never be quantised
        # to device f32 (see utils.coordinates.radec_to_lmn)
        phasecentre=np.asarray(phasecentre, np.float64),
        clean_beam=None,
        cellsize=float(cellsize),
        polarisation_frame=frame,
    )
