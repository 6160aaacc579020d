"""UV-grid data model: pytree equivalent of the reference's GridData
(``pixels [nchan, npol, v, u]`` complex uv-grid,
/root/reference/src/ska_sdp_func_python/grid_data/gridding.py:181-205).

The grid WCS reduces to the image cellsize: for an image of ``npixel`` pixels
of ``cellsize`` rad, the uv cell is ``1 / (npixel * cellsize)`` wavelengths.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp  # noqa: F401 - part of public typing surface

__all__ = ["GridData"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["pixels", "frequency"],
    meta_fields=["cellsize", "polarisation_frame"],
)
@dataclasses.dataclass
class GridData:
    """uv grid; ``pixels [nchan, npol, nv, nu]`` complex.

    ``cellsize`` is the *image* cellsize in radians; uv cell spacing is
    ``1/(n*cellsize)`` wavelengths.
    """

    pixels: jax.Array
    frequency: jax.Array
    cellsize: float = 0.001
    polarisation_frame: str = "stokesI"

    @property
    def npixel(self) -> int:
        return self.pixels.shape[-1]

    @property
    def uv_cell(self) -> float:
        return 1.0 / (self.pixels.shape[-1] * self.cellsize)

    def replace(self, **kwargs) -> "GridData":
        return dataclasses.replace(self, **kwargs)
