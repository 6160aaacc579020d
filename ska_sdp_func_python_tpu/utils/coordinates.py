"""Coordinate support (framework L1), pure JAX.

Re-implements the CASA-convention coordinate stack of the reference
(/root/reference/src/ska_sdp_func_python/util/coordinate_support.py) without
astropy: sky directions are plain (ra, dec) radians, and the astropy
skyoffset-frame based ``skycoord_to_lmn`` (coordinate_support.py:436-460) is
replaced by the closed-form spherical trigonometry below.

All functions are jnp-based, differentiable, and vmap/jit friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "lla_to_ecef",
    "ecef_to_enu",
    "enu_to_ecef",
    "enu_to_xyz",
    "xyz_at_latitude",
    "xyz_to_uvw",
    "uvw_to_xyz",
    "eci_to_uvw",
    "baselines",
    "xyz_to_baselines",
    "radec_to_lmn",
    "lmn_to_radec",
    "skycoord_to_lmn",
    "simulate_point",
    "visibility_shift",
    "uvw_transform",
    "parallactic_angle",
    "pa_z",
    "hadec_to_azel",
    "azel_to_hadec",
]

_WGS84_A = 6378137.0
_WGS84_B = 6356752.31424518


def lla_to_ecef(lat, lon, alt):
    """WGS84 geodetic -> ECEF cartesian (coordinate_support.py:66-85)."""
    n = _WGS84_A**2 / jnp.sqrt(
        _WGS84_A**2 * jnp.cos(lat) ** 2 + _WGS84_B**2 * jnp.sin(lat) ** 2
    )
    x = (n + alt) * jnp.cos(lat) * jnp.cos(lon)
    y = (n + alt) * jnp.cos(lat) * jnp.sin(lon)
    z = ((_WGS84_B**2 / _WGS84_A**2) * n + alt) * jnp.sin(lat)
    return x, y, z


def ecef_to_enu(location, xyz):
    """ECEF -> local ENU about ``location = (lat, lon, alt)`` (rad, rad, m)."""
    lat, lon, alt = location
    xyz = jnp.asarray(xyz)
    cx, cy, cz = lla_to_ecef(lat, lon, alt)
    d = xyz - jnp.stack(
        [jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(cz)]
    ).reshape(1, 3)
    sin_lat, cos_lat = jnp.sin(lat), jnp.cos(lat)
    sin_lon, cos_lon = jnp.sin(lon), jnp.cos(lon)
    e = -sin_lon * d[..., 0] + cos_lon * d[..., 1]
    n = (
        -sin_lat * cos_lon * d[..., 0]
        - sin_lat * sin_lon * d[..., 1]
        + cos_lat * d[..., 2]
    )
    u = (
        cos_lat * cos_lon * d[..., 0]
        + cos_lat * sin_lon * d[..., 1]
        + sin_lat * d[..., 2]
    )
    return jnp.stack([e, n, u], axis=-1)


def enu_to_ecef(location, enu):
    """Local ENU -> ECEF about ``location = (lat, lon, alt)``."""
    lat, lon, alt = location
    enu = jnp.asarray(enu)
    e, n, u = enu[..., 0], enu[..., 1], enu[..., 2]
    x0, y0, z0 = lla_to_ecef(lat, lon, alt)
    sin_lat, cos_lat = jnp.sin(lat), jnp.cos(lat)
    sin_lon, cos_lon = jnp.sin(lon), jnp.cos(lon)
    x = x0 - sin_lon * e - sin_lat * cos_lon * n + cos_lat * cos_lon * u
    y = y0 + cos_lon * e - sin_lat * sin_lon * n + cos_lat * sin_lon * u
    z = z0 + cos_lat * n + sin_lat * u
    return jnp.stack([x, y, z], axis=-1)


def enu_to_xyz(e, n, u, lat):
    """ENU -> celestial XYZ (TMS pp. 86-89; coordinate_support.py:236-249)."""
    sin_lat, cos_lat = jnp.sin(lat), jnp.cos(lat)
    return -sin_lat * n + cos_lat * u, e, cos_lat * n + sin_lat * u


def xyz_at_latitude(local_xyz, lat):
    """Rotate local XYZ into celestial XYZ (coordinate_support.py:252-272)."""
    local_xyz = jnp.asarray(local_xyz)
    x, y, z = local_xyz[..., 0], local_xyz[..., 1], local_xyz[..., 2]
    lat2 = jnp.pi / 2 - lat
    y2 = -z * jnp.sin(lat2) + y * jnp.cos(lat2)
    z2 = z * jnp.cos(lat2) + y * jnp.sin(lat2)
    return jnp.stack([x, y2, z2], axis=-1)


def xyz_to_uvw(xyz, ha, dec):
    """Earth XYZ -> uvw towards (ha, dec) (coordinate_support.py:335-363)."""
    xyz = jnp.asarray(xyz)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    u = x * jnp.cos(ha) - y * jnp.sin(ha)
    v0 = x * jnp.sin(ha) + y * jnp.cos(ha)
    w = z * jnp.sin(dec) - v0 * jnp.cos(dec)
    v = z * jnp.cos(dec) + v0 * jnp.sin(dec)
    return jnp.stack([u, v, w], axis=-1)


def uvw_to_xyz(uvw, ha, dec):
    """Inverse of :func:`xyz_to_uvw` (coordinate_support.py:366-393)."""
    uvw = jnp.asarray(uvw)
    u, v, w = uvw[..., 0], uvw[..., 1], uvw[..., 2]
    v0 = v * jnp.sin(dec) - w * jnp.cos(dec)
    z = v * jnp.cos(dec) + w * jnp.sin(dec)
    x = u * jnp.cos(ha) + v0 * jnp.sin(ha)
    y = -u * jnp.sin(ha) + v0 * jnp.cos(ha)
    return jnp.stack([x, y, z], axis=-1)


def eci_to_uvw(xyz, ha, dec):
    """ECI -> uvw (coordinate_support.py:275-305)."""
    xyz = jnp.asarray(xyz)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    u = jnp.sin(ha) * x + jnp.cos(ha) * y
    v = (
        -jnp.sin(dec) * jnp.cos(ha) * x
        + jnp.sin(dec) * jnp.sin(ha) * y
        + jnp.cos(dec) * z
    )
    w = (
        jnp.cos(dec) * jnp.cos(ha) * x
        - jnp.cos(dec) * jnp.sin(ha) * y
        + jnp.sin(dec) * z
    )
    return jnp.stack([u, v, w], axis=-1)


def baselines(ants_uvw):
    """All upper-triangle baselines ant2-ant1 (coordinate_support.py:396-413).

    Host-side (numpy) helper: index generation is static setup.
    """
    ants_uvw = np.asarray(ants_uvw)
    nants = ants_uvw.shape[0]
    a1, a2 = np.triu_indices(nants, 1)
    return ants_uvw[a2] - ants_uvw[a1]


def xyz_to_baselines(ants_xyz, ha_range, dec):
    """Baselines for a range of hour angles (coordinate_support.py:416-433)."""
    return np.concatenate(
        [
            baselines(np.asarray(xyz_to_uvw(ants_xyz, hax, dec)))
            for hax in np.asarray(ha_range)
        ]
    )


def _all_concrete(*xs) -> bool:
    """True when no argument is a jax tracer (host-f64 astrometry is
    possible; under jit the traced jnp path is kept)."""
    import jax.core

    return not any(isinstance(x, jax.core.Tracer) for x in xs)


def radec_to_lmn(ra, dec, ra0, dec0):
    """(ra, dec) -> direction cosines (l, m, n-1) about phase centre.

    Closed form of the astropy skyoffset transform used by the reference
    (coordinate_support.py:436-460): l increases eastwards, m northwards, and
    the returned third component is n-1 (zero at the phase centre).

    Astrometry contract: with concrete (non-traced) inputs the transform
    runs in HOST numpy float64 regardless of the device precision — an
    absolute direction error of eps32 (~1e-8 rad = 2 mas) costs
    ``2*pi*|uvw|*eps`` of visibility phase (~1e-3 at 2465-wavelength
    baselines, measured on chip), so f32 trig is never acceptable here.
    """
    if _all_concrete(ra, dec, ra0, dec0):
        ra, dec, ra0, dec0 = (
            np.asarray(ra, np.float64), np.asarray(dec, np.float64),
            np.asarray(ra0, np.float64), np.asarray(dec0, np.float64),
        )
        dra = ra - ra0
        l = np.cos(dec) * np.sin(dra)
        m = np.sin(dec) * np.cos(dec0) - np.cos(dec) * np.sin(
            dec0
        ) * np.cos(dra)
        n = np.sin(dec) * np.sin(dec0) + np.cos(dec) * np.cos(
            dec0
        ) * np.cos(dra)
        return l, m, n - 1.0
    dra = ra - ra0
    l = jnp.cos(dec) * jnp.sin(dra)
    m = jnp.sin(dec) * jnp.cos(dec0) - jnp.cos(dec) * jnp.sin(dec0) * jnp.cos(
        dra
    )
    n = jnp.sin(dec) * jnp.sin(dec0) + jnp.cos(dec) * jnp.cos(dec0) * jnp.cos(
        dra
    )
    return l, m, n - 1.0


def lmn_to_radec(l, m, ra0, dec0):
    """Inverse of :func:`radec_to_lmn` (coordinate_support.py:463-490).

    Host numpy float64 with concrete inputs (see :func:`radec_to_lmn`)."""
    if _all_concrete(l, m, ra0, dec0):
        l, m, ra0, dec0 = (
            np.asarray(l, np.float64), np.asarray(m, np.float64),
            np.asarray(ra0, np.float64), np.asarray(dec0, np.float64),
        )
        n = np.sqrt(1.0 - l**2 - m**2)
        dec = np.arcsin(m * np.cos(dec0) + n * np.sin(dec0))
        ra = ra0 + np.arctan2(l, n * np.cos(dec0) - m * np.sin(dec0))
        return ra, dec
    n = jnp.sqrt(1.0 - l**2 - m**2)
    dec = jnp.arcsin(m * jnp.cos(dec0) + n * jnp.sin(dec0))
    ra = ra0 + jnp.arctan2(l, n * jnp.cos(dec0) - m * jnp.sin(dec0))
    return ra, dec


def skycoord_to_lmn(pos, phasecentre):
    """(ra, dec) pair -> (l, m, n-1); accepts [..,2] arrays or 2-tuples."""
    if _all_concrete(pos, phasecentre):
        # stay on host: jnp.asarray would quantise to device f32 before
        # the f64 transform (see radec_to_lmn's astrometry contract)
        pos = np.asarray(pos, np.float64)
        pc = np.asarray(phasecentre, np.float64)
    else:
        pos = jnp.asarray(pos)
        pc = jnp.asarray(phasecentre)
    return radec_to_lmn(pos[..., 0], pos[..., 1], pc[..., 0], pc[..., 1])


def simulate_point(dist_uvw, l, m):
    """Unit point-source visibility phasor exp(-2pi i (ul+vm+w(n-1)))
    (coordinate_support.py:493-518)."""
    dist_uvw = jnp.asarray(dist_uvw)
    s = jnp.stack(
        [
            jnp.asarray(l),
            jnp.asarray(m),
            jnp.sqrt(1.0 - l**2 - m**2) - 1.0,
        ]
    )
    from ..config import frac_dot_turns

    # split-compensated mod-1 phase: a plain f32 dot loses |phase|*eps
    phase = -2.0 * jnp.pi * frac_dot_turns(dist_uvw, s)
    # lax.complex avoids a host-side complex constant (axon-safe)
    return jax.lax.complex(jnp.cos(phase), jnp.sin(phase))


def visibility_shift(uvw, vis, dl, dm):
    """Shift visibilities by (dl, dm) (coordinate_support.py:548-563)."""
    uvw = jnp.asarray(uvw)
    from ..config import frac_dot_turns

    s2 = jnp.stack([jnp.asarray(dl), jnp.asarray(dm)])
    phase = -2.0 * jnp.pi * frac_dot_turns(uvw[..., 0:2], s2)
    return vis * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))


def uvw_transform(uvw, transform_matrix):
    """Apply a 2x2 image-plane transform to uv (coordinate_support.py:566-584)."""
    uvw = jnp.asarray(uvw)
    uv1 = uvw[..., 0:2] @ jnp.asarray(transform_matrix)
    return jnp.concatenate([uv1, uvw[..., 2:3]], axis=-1)


def parallactic_angle(ha, dec, lat):
    """(coordinate_support.py:587-611)."""
    return jnp.arctan2(
        jnp.cos(lat) * jnp.sin(ha),
        jnp.sin(lat) * jnp.cos(dec)
        - jnp.cos(lat) * jnp.sin(dec) * jnp.cos(ha),
    )


def pa_z(ha, dec, lat):
    """Parallactic angle and zenith angle (coordinate_support.py:614-643)."""
    sinz = jnp.sin(dec) * jnp.sin(lat) + jnp.cos(dec) * jnp.cos(lat) * jnp.cos(
        ha
    )
    return parallactic_angle(ha, dec, lat), jnp.arcsin(sinz)


def hadec_to_azel(ha, dec, latitude):
    """(coordinate_support.py:646-673)."""
    az = jnp.arctan2(
        -jnp.cos(dec) * jnp.sin(ha),
        jnp.cos(latitude) * jnp.sin(dec)
        - jnp.sin(latitude) * jnp.cos(dec) * jnp.cos(ha),
    )
    el = jnp.arcsin(
        jnp.sin(latitude) * jnp.sin(dec)
        + jnp.cos(latitude) * jnp.cos(dec) * jnp.cos(ha)
    )
    return az, el


def azel_to_hadec(az, el, latitude):
    """(coordinate_support.py:676-702)."""
    ha = jnp.arctan2(
        -jnp.cos(el) * jnp.sin(az),
        jnp.cos(latitude) * jnp.sin(el)
        - jnp.sin(latitude) * jnp.cos(el) * jnp.cos(az),
    )
    dec = jnp.arcsin(
        jnp.sin(latitude) * jnp.sin(el)
        + jnp.cos(latitude) * jnp.cos(el) * jnp.cos(az)
    )
    return ha, dec


def ecef_to_lla(x, y, z):
    """ECEF -> (lat rad, lon rad, alt m), Bowring's method
    (util/coordinate_support.py:88-127)."""
    a = 6378137.00000000
    b = 6356752.31424518
    e2 = (a**2 - b**2) / a**2
    ep2 = (a**2 - b**2) / b**2
    p = jnp.sqrt(x**2 + y**2)
    lon = jnp.arctan2(y, x)
    theta = jnp.arctan2(z * a, p * b)
    lat = jnp.arctan2(
        z + ep2 * b * jnp.sin(theta) ** 3,
        p - e2 * a * jnp.cos(theta) ** 3,
    )
    n = a / jnp.sqrt(1.0 - e2 * jnp.sin(lat) ** 2)
    alt = p / jnp.cos(lat) - n
    return lat, lon, alt


def enu_to_eci(enu, lat):
    """[east, north, up] -> earth-centred-inertial [x, y, z]
    (util/coordinate_support.py:130-148)."""
    enu = jnp.asarray(enu)
    e, n, u = enu[..., 0], enu[..., 1], enu[..., 2]
    x = -jnp.sin(lat) * n + u * jnp.cos(lat)
    y = e
    z = n * jnp.cos(lat) + u * jnp.sin(lat)
    return jnp.stack([x, y, z], axis=-1)


def eci_to_enu(eci, lat):
    """Inverse of :func:`enu_to_eci` (util/coordinate_support.py:151-168)."""
    eci = jnp.asarray(eci)
    x, y, z = eci[..., 0], eci[..., 1], eci[..., 2]
    e = y
    n = -jnp.sin(lat) * x + z * jnp.cos(lat)
    u = jnp.cos(lat) * x + z * jnp.sin(lat)
    return jnp.stack([e, n, u], axis=-1)


def uvw_to_eci(uvw, ha, dec):
    """(u,v,w) -> ECI; identity pass-through mirroring the reference
    (util/coordinate_support.py:310-332, which notes the rotation is not
    applied)."""
    return jnp.asarray(uvw)


def lmn_to_skycoord(lmn, phasecentre):
    """Direction cosines (l, m, n) -> (ra, dec) radians about a
    phase centre (util/coordinate_support.py:463-490)."""
    l_c, m_c = lmn[0], lmn[1]
    return lmn_to_radec(l_c, m_c, phasecentre[0], phasecentre[1])


def simulate_point_antenna(dist_uvw, l, m):
    """Per-antenna phasor for a unit point source at (l, m): the one-sided
    factor of :func:`simulate_point` (util/coordinate_support.py:521-548)."""
    dist_uvw = jnp.asarray(dist_uvw)
    n_m1 = jnp.sqrt(1.0 - l**2 - m**2) - 1.0
    from ..config import expi, frac_dot_turns

    s = jnp.stack([jnp.asarray(l), jnp.asarray(m), n_m1])
    phase = -2.0 * jnp.pi * frac_dot_turns(dist_uvw, s)
    return expi(phase)
