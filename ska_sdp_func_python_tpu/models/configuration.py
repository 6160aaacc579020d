"""Array configuration model and observation simulation.

The reference takes these from ``ska-sdp-datamodels``
(``create_named_configuration``, ``create_visibility``) — users of this
framework need native equivalents to stand up an observation
(SURVEY.md L0). Configurations are generated synthetically (log-spiral
SKA-LOW-like and randomised-core layouts) — no data files.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from .visibility import Visibility, create_visibility_from_arrays

__all__ = [
    "Configuration",
    "create_named_configuration",
    "create_visibility",
]


@dataclasses.dataclass
class Configuration:
    """Antenna array: positions in celestial XYZ [nants, 3] (metres),
    names, diameters, and site location (lat, lon, alt)."""

    name: str
    xyz: np.ndarray
    names: list
    diameter: np.ndarray
    location: tuple  # (lat rad, lon rad, alt m)

    @property
    def nants(self) -> int:
        return self.xyz.shape[0]


_LOW_LOCATION = (np.deg2rad(-26.824722), np.deg2rad(116.764444), 300.0)
_MID_LOCATION = (np.deg2rad(-30.712925), np.deg2rad(21.443803), 1053.0)


def _log_spiral_layout(nants, rmax, rmin=35.0, arms=3, seed=1):
    """Multi-arm log-spiral + dense core, SKA-LOW-flavoured."""
    rng = np.random.default_rng(seed)
    ncore = nants // 2
    narm = nants - ncore
    r_core = rmin * np.sqrt(rng.uniform(0, 1, ncore))
    th_core = rng.uniform(0, 2 * np.pi, ncore)
    pts = [np.stack([r_core * np.cos(th_core), r_core * np.sin(th_core)], -1)]
    per_arm = narm // arms
    rem = narm - per_arm * arms
    for arm in range(arms):
        n = per_arm + (1 if arm < rem else 0)
        t = np.linspace(0.05, 1.0, n)
        r = rmin + (rmax - rmin) * t**1.5
        th = 2 * np.pi * arm / arms + 3.0 * t + rng.normal(0, 0.05, n)
        pts.append(np.stack([r * np.cos(th), r * np.sin(th)], -1))
    enu = np.concatenate(pts)[:nants]
    return enu


def create_named_configuration(
    name: str = "LOW", rmax: float = None, **kwargs
) -> Configuration:
    """Synthetic named configurations: "LOW"/"LOWBD2" (512 stations,
    35 m), "MID" (197 dishes, 15 m); ``rmax`` trims to a maximum radius.
    """
    from ..utils.coordinates import enu_to_xyz

    if name.startswith("LOW"):
        nants, diam, location = 512, 38.0, _LOW_LOCATION
        default_r = 40000.0
    elif name.startswith("MID"):
        nants, diam, location = 197, 15.0, _MID_LOCATION
        default_r = 80000.0
    else:
        raise ValueError(f"Unknown configuration {name}")
    # generate the full-scale layout, then trim by rmax (matching the
    # reference's "rmax cut" semantics on fixed layouts)
    enu2d = _log_spiral_layout(nants, default_r)
    if rmax is not None:
        keep = np.hypot(enu2d[:, 0], enu2d[:, 1]) <= rmax
        enu2d = enu2d[keep]
    lat = location[0]
    x, y, z = enu_to_xyz(
        jnp.asarray(enu2d[:, 0]),
        jnp.asarray(enu2d[:, 1]),
        jnp.zeros(enu2d.shape[0]),
        lat,
    )
    xyz = np.stack([np.asarray(x), np.asarray(y), np.asarray(z)], -1)
    n = xyz.shape[0]
    return Configuration(
        name=name,
        xyz=xyz,
        names=[f"{name}_{i:03d}" for i in range(n)],
        diameter=np.full(n, diam),
        location=location,
    )


def create_visibility(
    config: Configuration,
    times,
    frequency,
    channel_bandwidth=None,
    phasecentre=(0.0, np.deg2rad(-35.0)),
    polarisation_frame: str = "stokesI",
    weight: float = 1.0,
    elevation_limit=None,
    **kwargs,
) -> Visibility:
    """Simulate an observation: compute uvw for hour angles ``times`` (rad)
    and return an empty Visibility (datamodels create_visibility
    equivalent).

    ``elevation_limit`` (rad) drops integrations below the horizon limit.
    """
    from ..utils.coordinates import hadec_to_azel, xyz_to_uvw

    times = np.atleast_1d(np.asarray(times, dtype=float))
    frequency = np.atleast_1d(np.asarray(frequency, dtype=float))
    dec = float(phasecentre[1])
    lat = config.location[0]
    if elevation_limit is not None:
        keep = []
        for ha in times:
            _, el = hadec_to_azel(ha, dec, lat)
            if float(el) >= elevation_limit:
                keep.append(ha)
        times = np.asarray(keep)
    nants = config.nants
    a1, a2 = np.triu_indices(nants, 1)
    uvw = np.stack(
        [
            np.asarray(xyz_to_uvw(config.xyz[a2] - config.xyz[a1], ha, dec))
            for ha in times
        ]
    )
    tsec = times * 86164.1 / (2 * np.pi)
    vis = create_visibility_from_arrays(
        uvw=jnp.asarray(uvw),
        time=jnp.asarray(tsec),
        frequency=jnp.asarray(frequency),
        antenna1=a1,
        antenna2=a2,
        phasecentre=np.asarray(
            [float(phasecentre[0]), float(phasecentre[1])], np.float64
        ),
        polarisation_frame=polarisation_frame,
        channel_bandwidth=(
            jnp.asarray(np.atleast_1d(channel_bandwidth))
            if channel_bandwidth is not None
            else None
        ),
        nants=nants,
    )
    if weight != 1.0:
        vis = vis.replace(weight=vis.weight * weight)
    return vis
