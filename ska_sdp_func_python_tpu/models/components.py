"""Sky component + sky model data models.

TPU-first redesign of the reference's ``SkyComponent`` (a per-source python
object, /root/reference/src/ska_sdp_func_python/sky_component/operations.py)
into a *batched* structure-of-arrays: a single ``SkyComponents`` pytree holds
``ncomp`` sources so DFT predict and beam application are one einsum over the
component axis instead of a python loop over objects.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SkyComponents", "SkyModel"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["direction", "flux", "frequency", "shape_params"],
    meta_fields=["shape", "polarisation_frame"],
)
@dataclasses.dataclass
class SkyComponents:
    """Batch of sky components.

    ``direction`` ``[ncomp, 2]`` (ra, dec) rad; ``flux`` ``[ncomp, nchan,
    npol]``; ``frequency`` ``[nchan]``; ``shape_params`` ``[ncomp, 3]``
    (bmaj, bmin, bpa in radians — zero for point sources).
    """

    direction: jax.Array
    flux: jax.Array
    frequency: jax.Array
    shape_params: jax.Array
    shape: str = "Point"
    polarisation_frame: str = "stokesI"

    @property
    def ncomp(self) -> int:
        return self.direction.shape[0]

    @property
    def nchan(self) -> int:
        return self.flux.shape[1]

    @property
    def npol(self) -> int:
        return self.flux.shape[2]

    def replace(self, **kwargs) -> "SkyComponents":
        return dataclasses.replace(self, **kwargs)

    def select(self, idx) -> "SkyComponents":
        idx = jnp.asarray(idx)
        return dataclasses.replace(
            self,
            direction=self.direction[idx],
            flux=self.flux[idx],
            shape_params=self.shape_params[idx],
        )

    @classmethod
    def from_lists(
        cls,
        directions,
        fluxes,
        frequency,
        shape: str = "Point",
        polarisation_frame: str = "stokesI",
        shape_params=None,
    ) -> "SkyComponents":
        directions = np.asarray(directions, dtype=float).reshape(-1, 2)
        fluxes = np.asarray(fluxes, dtype=float)
        if fluxes.ndim == 2:  # [ncomp, npol] -> single channel
            fluxes = fluxes[:, None, :]
        if shape_params is None:
            shape_params = np.zeros((directions.shape[0], 3))
        return cls(
            # host numpy f64 (astrometry contract — see
            # utils.coordinates.radec_to_lmn)
            direction=np.asarray(directions, np.float64),
            flux=jnp.asarray(fluxes),
            frequency=jnp.atleast_1d(jnp.asarray(frequency)),
            shape_params=jnp.asarray(shape_params),
            shape=shape,
            polarisation_frame=str(polarisation_frame),
        )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["image", "components", "gaintable", "mask"],
    meta_fields=["fixed"],
)
@dataclasses.dataclass
class SkyModel:
    """Sky model = optional image + optional components (+ gaintable, mask).

    Mirrors the reference SkyModel used by
    /root/reference/src/ska_sdp_func_python/sky_model/skymodel_imaging.py:70-235.
    """

    image: Optional[object]  # Image
    components: Optional[SkyComponents]
    gaintable: Optional[object]  # GainTable
    mask: Optional[jax.Array]  # [ny, nx] multiplicative mask
    fixed: bool = False

    def replace(self, **kwargs) -> "SkyModel":
        return dataclasses.replace(self, **kwargs)
