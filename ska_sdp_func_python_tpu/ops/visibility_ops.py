"""Visibility operations (framework L3, C13/C14).

Equivalents of /root/reference/src/ska_sdp_func_python/visibility/base.py and
visibility/operations.py on the pytree Visibility model. All ops are pure
functions returning new Visibility pytrees and jit cleanly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..models.polarisation import (
    convert_circular_to_stokes,
    convert_circular_to_stokesI,
    convert_linear_to_stokes,
    convert_linear_to_stokesI,
)
from ..models.visibility import Visibility
from ..utils.coordinates import radec_to_lmn, uvw_to_xyz, xyz_to_uvw

__all__ = [
    "calculate_visibility_phasor",
    "phaserotate_visibility",
    "concatenate_visibility",
    "subtract_visibility",
    "divide_visibility",
    "remove_continuum_visibility",
    "integrate_visibility_by_channel",
    "average_visibility_by_channel",
    "convert_visibility_to_stokes",
    "convert_visibility_to_stokesI",
    "convert_visibility_stokesI_to_polframe",
    "expand_polarizations",
]


def calculate_visibility_phasor(direction, vis: Visibility):
    """Phasor for a sky direction: exp(-2pi i uvw_lambda . lmn)
    (visibility/base.py:27-45). Returns [ntime, nbl, nchan] complex
    (the reference broadcasts over pol; we leave pol to the caller)."""
    if not isinstance(direction, jax.core.Tracer):
        # host f64 astrometry (see utils.coordinates.radec_to_lmn)
        direction = np.asarray(direction, np.float64)
    l, m, n1 = radec_to_lmn(
        direction[..., 0],
        direction[..., 1],
        vis.phasecentre[0],
        vis.phasecentre[1],
    )
    s = jnp.stack([l, m, n1])
    from ..config import expi, frac_dot_turns

    # split-compensated mod-1 phase: a plain f32 dot loses |phase|*eps
    phase = -2.0 * jnp.pi * frac_dot_turns(vis.uvw_lambda, s)
    return expi(phase).astype(vis.vis.dtype)


def phaserotate_visibility(
    vis: Visibility, newphasecentre, tangent: bool = True, inverse: bool = False
) -> Visibility:
    """Phase rotate to a new phase centre (visibility/base.py:60-125).

    With ``tangent=False`` the uvw are rotated into the new frame and the
    phasecentre attribute updated.
    """
    newphasecentre = jnp.asarray(newphasecentre)
    phasor = calculate_visibility_phasor(newphasecentre, vis)[..., None]
    if inverse:
        new_visdata = vis.vis * phasor
    else:
        new_visdata = vis.vis * jnp.conj(phasor)
    out = vis.replace(vis=new_visdata)
    if not tangent:
        if inverse:
            xyz = uvw_to_xyz(
                vis.uvw, ha=-vis.phasecentre[0], dec=vis.phasecentre[1]
            )
            uvw_new = xyz_to_uvw(
                xyz, ha=-newphasecentre[0], dec=newphasecentre[1]
            )
        else:
            xyz = uvw_to_xyz(
                vis.uvw, ha=-vis.phasecentre[0], dec=vis.phasecentre[1]
            )
            uvw_new = xyz_to_uvw(
                xyz, ha=-newphasecentre[0], dec=newphasecentre[1]
            )
        out = out.replace(uvw=uvw_new, phasecentre=newphasecentre)
    return out


def concatenate_visibility(vis_list, dim: str = "time") -> Visibility:
    """Concatenate along time or frequency (visibility/operations.py:38-83)."""
    if not vis_list:
        raise ValueError("concatenate_visibility: vis_list is empty")
    v0 = vis_list[0]
    if dim == "time":
        return v0.replace(
            vis=jnp.concatenate([v.vis for v in vis_list], axis=0),
            weight=jnp.concatenate([v.weight for v in vis_list], axis=0),
            imaging_weight=jnp.concatenate(
                [v.imaging_weight for v in vis_list], axis=0
            ),
            flags=jnp.concatenate([v.flags for v in vis_list], axis=0),
            uvw=jnp.concatenate([v.uvw for v in vis_list], axis=0),
            time=jnp.concatenate([v.time for v in vis_list], axis=0),
            integration_time=jnp.concatenate(
                [v.integration_time for v in vis_list], axis=0
            ),
        )
    if dim == "frequency":
        return v0.replace(
            vis=jnp.concatenate([v.vis for v in vis_list], axis=2),
            weight=jnp.concatenate([v.weight for v in vis_list], axis=2),
            imaging_weight=jnp.concatenate(
                [v.imaging_weight for v in vis_list], axis=2
            ),
            flags=jnp.concatenate([v.flags for v in vis_list], axis=2),
            frequency=jnp.concatenate(
                [v.frequency for v in vis_list], axis=0
            ),
            channel_bandwidth=jnp.concatenate(
                [v.channel_bandwidth for v in vis_list], axis=0
            ),
        )
    raise ValueError(f"concatenate_visibility: unknown dim {dim}")


def subtract_visibility(vis: Visibility, model_vis: Visibility) -> Visibility:
    """vis - model_vis (visibility/operations.py:86-105)."""
    return vis.replace(vis=vis.vis - model_vis.vis)


def divide_visibility(vis: Visibility, modelvis: Visibility) -> Visibility:
    """Point-source-equivalent visibility X = V_obs / V_model with weight
    |V_model|^2 w (visibility/operations.py:145-189)."""
    mflag = (1 - modelvis.flags).astype(modelvis.weight.dtype)
    mvis = modelvis.vis * mflag
    xwt = jnp.abs(mvis) ** 2 * vis.flagged_weight
    ok = xwt > 0.0
    x = jnp.where(
        # zero-from-array instead of a complex literal (axon-safe)
        ok, vis.flagged_vis / jnp.where(ok, mvis, 1.0), vis.vis * 0.0
    )
    return vis.replace(vis=x, weight=xwt.astype(vis.weight.dtype))


def remove_continuum_visibility(
    vis: Visibility, degree: int = 1, mask=None
) -> Visibility:
    """Fit and subtract a frequency-polynomial continuum per (time, baseline,
    pol) (visibility/operations.py:108-142). The reference's triple python
    loop over rows becomes one batched least-squares solve."""
    nchan = vis.nchan
    x = (vis.frequency - vis.frequency[nchan // 2]) / (
        vis.frequency[0] - vis.frequency[nchan // 2]
    )
    wt = jnp.sqrt(vis.flagged_weight)  # [t, b, f, p]
    if mask is not None:
        wt = wt * (1.0 - jnp.asarray(mask, dtype=wt.dtype))[None, None, :, None]
    # Vandermonde design matrix [f, degree+1]
    powers = jnp.arange(degree, -1, -1)
    vand = x[:, None] ** powers[None, :]
    # weighted LSQ per (t,b,p): A = w*V, y = w*vis
    wtm = jnp.moveaxis(wt, 2, -1)  # [t,b,p,f]
    vism = jnp.moveaxis(vis.vis, 2, -1)  # [t,b,p,f]
    a = wtm[..., :, None] * vand[None, None, None, :, :]
    y = wtm.astype(vism.dtype) * vism
    ata = jnp.einsum("...fi,...fj->...ij", a, a)
    aty = jnp.einsum("...fi,...f->...i", a.astype(vism.dtype), y)
    coef = jnp.linalg.solve(
        ata.astype(vism.dtype)
        + 1e-30 * jnp.eye(degree + 1, dtype=vism.dtype),
        aty[..., None],
    )[..., 0]
    pred = jnp.einsum("fi,...i->...f", vand.astype(vism.dtype), coef)
    newvis = jnp.moveaxis(vism - pred, -1, 2)
    return vis.replace(vis=newvis)


def integrate_visibility_by_channel(vis: Visibility) -> Visibility:
    """Collapse the channel axis (visibility/operations.py:192-235)."""
    fw = vis.flagged_weight
    flags = jnp.sum(vis.flags, axis=-2, keepdims=True)
    flags = jnp.where(flags < vis.nchan, 0, 1)
    newvis = jnp.sum(vis.vis * fw.astype(vis.vis.dtype), axis=-2, keepdims=True)
    newweights = jnp.sum(fw, axis=-2, keepdims=True)
    newimwt = jnp.sum(vis.flagged_imaging_weight, axis=-2, keepdims=True)
    denom = (1 - flags) * newweights
    ok = denom > 0.0
    newvis = jnp.where(
        ok, newvis / jnp.where(ok, denom, 1.0).astype(newvis.dtype), newvis
    )
    return vis.replace(
        vis=newvis,
        weight=newweights,
        imaging_weight=newimwt,
        flags=flags.astype(vis.flags.dtype),
        frequency=jnp.mean(vis.frequency, keepdims=True),
        channel_bandwidth=jnp.sum(vis.channel_bandwidth, keepdims=True),
    )


def average_visibility_by_channel(vis: Visibility, channel_average: int):
    """Average groups of ``channel_average`` channels; returns a list of
    single-channel Visibility (visibility/operations.py:238-306)."""
    out = []
    for start in range(0, vis.nchan, channel_average):
        stop = min(start + channel_average, vis.nchan)
        sub = vis.replace(
            vis=vis.vis[..., start:stop, :],
            weight=vis.weight[..., start:stop, :],
            imaging_weight=vis.imaging_weight[..., start:stop, :],
            flags=vis.flags[..., start:stop, :],
            frequency=vis.frequency[start:stop],
            channel_bandwidth=vis.channel_bandwidth[start:stop],
        )
        out.append(integrate_visibility_by_channel(sub))
    return out


def _pair_flags(flags, i, j):
    return jnp.broadcast_to(
        jnp.logical_or(flags[..., i], flags[..., j])[..., None].astype(
            flags.dtype
        ),
        flags.shape[:-1] + (1,),
    )


def convert_visibility_to_stokes(vis: Visibility) -> Visibility:
    """linear/circular -> stokesIQUV in place
    (visibility/operations.py:309-333)."""
    if vis.polarisation_frame == "linear":
        newvis = convert_linear_to_stokes(vis.vis, polaxis=3)
    elif vis.polarisation_frame == "circular":
        newvis = convert_circular_to_stokes(vis.vis, polaxis=3)
    else:
        return vis
    flags = jnp.broadcast_to(_pair_flags(vis.flags, 0, 3), vis.flags.shape)
    return dataclasses.replace(
        vis,
        vis=newvis,
        flags=flags,
        polarisation_frame="stokesIQUV",
    )


def convert_visibility_to_stokesI(vis: Visibility) -> Visibility:
    """Extract Stokes I (visibility/operations.py:336-420)."""
    frame = vis.polarisation_frame
    if frame == "stokesI":
        return vis
    if frame in ("linear", "circular"):
        i, j = 0, 3
    elif frame in ("linearnp", "circularnp"):
        i, j = 0, 1
    else:
        raise ValueError(f"Unsupported frame {frame}")
    conv = (
        convert_linear_to_stokesI
        if frame.startswith("linear")
        else convert_circular_to_stokesI
    )
    vis_data = conv(vis.flagged_vis)
    flags = _pair_flags(vis.flags, i, j)
    weight = (vis.flagged_weight[..., i] + vis.flagged_weight[..., j])[
        ..., None
    ]
    imwt = (
        vis.flagged_imaging_weight[..., i] + vis.flagged_imaging_weight[..., j]
    )[..., None]
    return dataclasses.replace(
        vis,
        vis=vis_data,
        weight=weight,
        imaging_weight=imwt,
        flags=flags,
        polarisation_frame="stokesI",
    )


def convert_visibility_stokesI_to_polframe(
    vis: Visibility, poldef: str
) -> Visibility:
    """Stokes I -> full frame with zero cross terms
    (visibility/operations.py:423-471)."""
    from ..models.polarisation import npol as _frame_npol

    if vis.polarisation_frame == str(poldef):
        return vis
    n = _frame_npol(str(poldef))
    vis_data = jnp.repeat(vis.flagged_vis[..., :1], n, axis=-1)
    if n == 4:
        vis_data = vis_data.at[..., 1].set(0.0).at[..., 2].set(0.0)
    flags = jnp.repeat(vis.flags[..., :1], n, axis=-1)
    weight = jnp.repeat(vis.flagged_weight[..., :1], n, axis=-1)
    imwt = jnp.repeat(vis.flagged_imaging_weight[..., :1], n, axis=-1)
    return dataclasses.replace(
        vis,
        vis=vis_data,
        weight=weight,
        imaging_weight=imwt,
        flags=flags,
        polarisation_frame=str(poldef),
    )


def expand_polarizations(data, dtype=None):
    """Expand a [..., npol] array to 4 polarisations
    (visibility/operations.py:474-503)."""
    data = jnp.asarray(data)
    if dtype is None:
        dtype = data.dtype
    n = data.shape[-1]
    if n == 4:
        return data.astype(dtype)
    out = jnp.zeros(data.shape[:-1] + (4,), dtype=dtype)
    if n == 2:
        out = out.at[..., 0].set(data[..., 0]).at[..., 3].set(data[..., 1])
    else:
        out = out.at[..., 0].set(data[..., 0]).at[..., 3].set(data[..., 0])
    return out


def concatenate_visibility_frequency(bvis_list):
    """Concatenate a channel-ordered list of Visibilities in frequency
    (visibility/operations.py:75-83)."""
    return concatenate_visibility(bvis_list, dim="frequency")


def calculate_visibility_uvw_lambda(vis: Visibility) -> Visibility:
    """Recompute per-channel uvw in wavelengths from uvw [m]
    (visibility/base.py:48-57). Our Visibility derives ``uvw_lambda`` on
    access; this returns the (unchanged) dataset for API parity."""
    _ = vis.uvw_lambda
    return vis
