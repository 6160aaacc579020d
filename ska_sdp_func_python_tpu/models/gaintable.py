"""GainTable data model: pytree equivalent of the reference's xarray GainTable
(dims [time, antenna, frequency, receptor1, receptor2]; see SURVEY.md L0 and
/root/reference/src/ska_sdp_func_python/calibration/solvers.py:72-80).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["GainTable", "create_gaintable_from_visibility"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["gain", "weight", "residual", "time", "interval", "frequency"],
    meta_fields=["jones_type", "receptor_frame"],
)
@dataclasses.dataclass
class GainTable:
    """Antenna-based complex gain (Jones) solutions.

    ``gain``/``weight`` are ``[ntime, nants, nchan, nrec, nrec]``;
    ``residual`` is ``[ntime, nchan, nrec, nrec]``;
    ``time``/``interval`` are ``[ntime]`` (solution-interval centres/widths);
    ``frequency`` is ``[nchan]``.
    """

    gain: jax.Array
    weight: jax.Array
    residual: jax.Array
    time: jax.Array
    interval: jax.Array
    frequency: jax.Array
    jones_type: str = "T"
    receptor_frame: str = "linear"

    @property
    def ntimes(self) -> int:
        return self.gain.shape[0]

    @property
    def nants(self) -> int:
        return self.gain.shape[1]

    @property
    def nchan(self) -> int:
        return self.gain.shape[2]

    @property
    def nrec(self) -> int:
        return self.gain.shape[3]

    def replace(self, **kwargs) -> "GainTable":
        return dataclasses.replace(self, **kwargs)


def _solution_intervals(time, integration_time, timeslice):
    """Host-side computation of solution-interval centres/widths.

    Mirrors ska-sdp-datamodels ``create_gaintable_from_visibility``:
    ``timeslice`` None/"auto" -> one solution per unique integration;
    a number -> fixed-width bins covering the observation.
    """
    time = np.asarray(time)
    integration_time = np.asarray(integration_time)
    if timeslice is None or timeslice == "auto":
        utime, idx = np.unique(time, return_index=True)
        return utime, integration_time[idx]
    timeslice = float(timeslice)
    tmin, tmax = time.min(), time.max()
    nbins = max(1, int(np.ceil((tmax - tmin) / timeslice))) if tmax > tmin else 1
    centres = tmin + (np.arange(nbins) + 0.5) * timeslice
    widths = np.full(nbins, timeslice)
    return centres, widths


def create_gaintable_from_visibility(
    vis, jones_type: str = "T", timeslice=None
) -> GainTable:
    """Create a unit gaintable matching ``vis``.

    Jones types (chain_calibration.py:27-72 semantics):
    "T"/"G" -> single channel; "B" -> one solution channel per vis channel.
    ``nrec`` is 1 for stokesI visibilities, else 2.
    """
    nants = vis.nants
    nrec = 1 if vis.npol == 1 else 2
    if jones_type == "B":
        frequency = np.asarray(vis.frequency)
    else:
        frequency = np.asarray([np.mean(np.asarray(vis.frequency))])
    nchan = len(frequency)
    centres, widths = _solution_intervals(
        vis.time, vis.integration_time, timeslice
    )
    ntab = len(centres)
    cdtype = jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64
    rdtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    from ..config import czeros

    gain = czeros((ntab, nants, nchan, nrec, nrec), cdtype)
    eye_r = jnp.eye(nrec, dtype=rdtype)
    gain = gain + jax.lax.complex(eye_r, jnp.zeros_like(eye_r)).astype(cdtype)
    return GainTable(
        gain=gain,
        weight=jnp.ones((ntab, nants, nchan, nrec, nrec), dtype=rdtype),
        residual=jnp.zeros((ntab, nchan, nrec, nrec), dtype=rdtype),
        time=jnp.asarray(centres),
        interval=jnp.asarray(widths),
        frequency=jnp.asarray(frequency),
        jones_type=jones_type,
        receptor_frame="linear",
    )
