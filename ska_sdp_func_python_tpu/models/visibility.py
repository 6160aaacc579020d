"""Visibility data model: a JAX pytree replacement for the reference's
xarray-based ``Visibility`` (shape semantics documented in SURVEY.md L0 and
used throughout /root/reference/src/ska_sdp_func_python/).

Design notes (TPU-first):
* All array fields are device arrays with static shapes so every operation
  jits; metadata (pol frame, antenna count) is static pytree aux data.
* Flags are carried as float multipliers is avoided — flags are int arrays but
  every consumer uses ``flagged_*`` products, mirroring the reference's
  ``(1-flags)*weight`` semantics (solvers.py:99-106). This keeps everything
  branch-free.
* ``uvw_lambda`` is computed on the fly (cheap outer product, fuses into the
  consumer), mirroring visibility/base.py:48-57.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .polarisation import PolarisationFrame, npol as _frame_npol

C_M_S = 299792458.0  # speed of light [m/s]

__all__ = ["Visibility", "create_visibility_from_arrays", "C_M_S"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "vis",
        "weight",
        "imaging_weight",
        "flags",
        "uvw",
        "time",
        "integration_time",
        "frequency",
        "channel_bandwidth",
        "antenna1",
        "antenna2",
        "phasecentre",
    ],
    meta_fields=["polarisation_frame", "nants", "station_diameter"],
)
@dataclasses.dataclass
class Visibility:
    """Batched visibility data.

    Shapes: ``vis/weight/flags`` are ``[ntime, nbaseline, nchan, npol]``,
    ``uvw`` is ``[ntime, nbaseline, 3]`` in metres, ``antenna1/antenna2``
    are ``[nbaseline]`` int32, ``phasecentre`` is ``[2]`` = (ra, dec) rad.
    """

    vis: jax.Array
    weight: jax.Array
    imaging_weight: jax.Array
    flags: jax.Array
    uvw: jax.Array
    time: jax.Array
    integration_time: jax.Array
    frequency: jax.Array
    channel_bandwidth: jax.Array
    antenna1: jax.Array
    antenna2: jax.Array
    phasecentre: jax.Array
    polarisation_frame: str = "stokesI"
    nants: int = 0
    # minimum station/dish diameter [m] of the array configuration (the
    # reference reads configuration.diameter for imaging advice,
    # imaging/base.py:506); SKA-LOW station default
    station_diameter: float = 35.0

    # --- shape accessors -------------------------------------------------
    @property
    def ntimes(self) -> int:
        return self.vis.shape[0]

    @property
    def nbaselines(self) -> int:
        return self.vis.shape[1]

    @property
    def nchan(self) -> int:
        return self.vis.shape[2]

    @property
    def npol(self) -> int:
        return self.vis.shape[3]

    @property
    def nvis(self) -> int:
        return int(np.prod(self.vis.shape))

    # --- derived products ------------------------------------------------
    @property
    def flagged_vis(self) -> jax.Array:
        # int -> real -> (promoted) complex: direct int->complex conversion
        # is unimplemented on the axon TPU backend
        return self.vis * (1 - self.flags).astype(self.weight.dtype)

    @property
    def flagged_weight(self) -> jax.Array:
        return self.weight * (1 - self.flags).astype(self.weight.dtype)

    @property
    def flagged_imaging_weight(self) -> jax.Array:
        return self.imaging_weight * (1 - self.flags).astype(
            self.imaging_weight.dtype
        )

    @property
    def uvw_lambda(self) -> jax.Array:
        """uvw in wavelengths, ``[ntime, nbaseline, nchan, 3]``
        (visibility/base.py:48-57)."""
        k = self.frequency / C_M_S
        return jnp.einsum("tbs,f->tbfs", self.uvw, k)

    def replace(self, **kwargs) -> "Visibility":
        return dataclasses.replace(self, **kwargs)

    def with_vis(self, vis: jax.Array) -> "Visibility":
        return dataclasses.replace(self, vis=vis)


def create_visibility_from_arrays(
    *,
    uvw,
    time,
    frequency,
    antenna1,
    antenna2,
    vis=None,
    weight=None,
    flags=None,
    imaging_weight=None,
    integration_time=None,
    channel_bandwidth=None,
    phasecentre=(0.0, 0.0),
    polarisation_frame="stokesI",
    nants=None,
    station_diameter=35.0,
) -> Visibility:
    """Convenience constructor filling defaults (zero vis, unit weight)."""
    uvw = jnp.asarray(uvw)
    time = jnp.asarray(time)
    frequency = jnp.atleast_1d(jnp.asarray(frequency))
    antenna1 = jnp.asarray(antenna1, dtype=jnp.int32)
    antenna2 = jnp.asarray(antenna2, dtype=jnp.int32)
    frame = (
        polarisation_frame.name
        if isinstance(polarisation_frame, PolarisationFrame)
        else str(polarisation_frame)
    )
    np_ = _frame_npol(frame)
    ntime, nbl = uvw.shape[0], uvw.shape[1]
    nchan = frequency.shape[0]
    shape = (ntime, nbl, nchan, np_)
    cdtype = jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64
    rdtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if vis is None:
        from ..config import czeros

        vis = czeros(shape, cdtype)
    else:
        vis = jnp.asarray(vis)
    if weight is None:
        weight = jnp.ones(shape, dtype=rdtype)
    else:
        weight = jnp.asarray(weight)
    if imaging_weight is None:
        imaging_weight = weight
    else:
        imaging_weight = jnp.asarray(imaging_weight)
    if flags is None:
        flags = jnp.zeros(shape, dtype=jnp.int32)
    else:
        flags = jnp.asarray(flags)
    if integration_time is None:
        if ntime > 1:
            dt = jnp.diff(time)
            integration_time = jnp.concatenate([dt, dt[-1:]])
        else:
            integration_time = jnp.ones_like(time)
    else:
        integration_time = jnp.asarray(integration_time)
    if channel_bandwidth is None:
        if nchan > 1:
            df = jnp.diff(frequency)
            channel_bandwidth = jnp.concatenate([df, df[-1:]])
        else:
            channel_bandwidth = jnp.full((1,), 1e6, dtype=frequency.dtype)
    else:
        channel_bandwidth = jnp.asarray(channel_bandwidth)
    if nants is None:
        nants = int(
            max(np.max(np.asarray(antenna1)), np.max(np.asarray(antenna2)))
            + 1
        )
    return Visibility(
        vis=vis,
        weight=weight,
        imaging_weight=imaging_weight,
        flags=flags,
        uvw=uvw,
        time=time,
        integration_time=integration_time,
        frequency=frequency,
        channel_bandwidth=channel_bandwidth,
        antenna1=antenna1,
        antenna2=antenna2,
        # host numpy f64: astrometric metadata must never be quantised
        # to device f32 (see utils.coordinates.radec_to_lmn)
        phasecentre=np.asarray(phasecentre, np.float64),
        polarisation_frame=frame,
        nants=int(nants),
        station_diameter=float(station_diameter),
    )
