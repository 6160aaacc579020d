"""Synthetic observation fixtures (mirrors the reference test strategy of
generated configurations + analytic components, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from ska_sdp_func_python_tpu.models import (
    create_visibility_from_arrays,
)
from ska_sdp_func_python_tpu.utils.coordinates import xyz_to_uvw


def random_array_xyz(nants: int, rmax: float = 1000.0, seed: int = 42):
    """Pseudo-random 2-D array layout rotated to celestial XYZ at a
    LOW-like latitude."""
    rng = np.random.default_rng(seed)
    r = rmax * np.sqrt(rng.uniform(0.1, 1.0, nants))
    th = rng.uniform(0, 2 * np.pi, nants)
    e, n = r * np.cos(th), r * np.sin(th)
    u = np.zeros(nants)
    lat = np.deg2rad(-26.82)
    x = -np.sin(lat) * n + np.cos(lat) * u
    y = e
    z = np.cos(lat) * n + np.sin(lat) * u
    return np.stack([x, y, z], axis=-1)


def make_visibility(
    nants=8,
    ntimes=3,
    nchan=2,
    frequency0=1.0e8,
    channel_bandwidth=1.0e6,
    polarisation_frame="stokesI",
    rmax=600.0,
    phasecentre=(0.0, np.deg2rad(-35.0)),
    times=None,
    seed=42,
):
    """Simulated Visibility with zero data and computed uvw."""
    ants = random_array_xyz(nants, rmax=rmax, seed=seed)
    a1, a2 = np.triu_indices(nants, 1)
    if times is None:
        times = np.linspace(-np.pi / 12.0, np.pi / 12.0, ntimes)  # HA rad
    dec = phasecentre[1]
    uvw = np.stack(
        [
            np.asarray(xyz_to_uvw(ants[a2] - ants[a1], ha, dec))
            for ha in times
        ]
    )
    frequency = frequency0 + channel_bandwidth * np.arange(nchan)
    # times in seconds: HA rad -> sidereal seconds
    tsec = times * 86164.1 / (2 * np.pi)
    return create_visibility_from_arrays(
        uvw=jnp.asarray(uvw),
        time=jnp.asarray(tsec),
        frequency=jnp.asarray(frequency),
        antenna1=a1,
        antenna2=a2,
        phasecentre=jnp.asarray(phasecentre),
        polarisation_frame=polarisation_frame,
        nants=nants,
    )
