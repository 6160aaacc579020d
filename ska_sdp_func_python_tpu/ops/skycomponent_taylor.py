"""SkyComponent frequency Taylor-term machinery (framework L3, C25).

Equivalents of
/root/reference/src/ska_sdp_func_python/sky_component/taylor_terms.py:32-241,
batched: the reference loops per source and per moment over python
SkyComponent objects; here one ``SkyComponents`` pytree holds all sources,
so the channel<->moment maps are single einsums over its
``flux [ncomp, nchan, npol]``.

The per-channel list representations (``transpose_skycomponents_to_channels``
/ ``gather_skycomponents_from_channels``) are kept for API parity with the
reference's [chan][source] decomposition primitives.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from ..models.components import SkyComponents
from .taylor import moment_weights

__all__ = [
    "calculate_skycomponent_list_taylor_terms",
    "find_skycomponents_frequency_taylor_terms",
    "gather_skycomponents_from_channels",
    "interpolate_skycomponents_frequency",
    "transpose_skycomponents_to_channels",
]


def _reference_frequency(frequency, reference_frequency):
    frequency = np.asarray(frequency)
    if reference_frequency is None:
        return float(frequency[len(frequency) // 2])
    return float(reference_frequency)


def calculate_skycomponent_list_taylor_terms(
    sc: SkyComponents, nmoment: int = 1, reference_frequency=None
) -> SkyComponents:
    """Frequency Taylor terms of all components
    (sky_component/taylor_terms.py:32-80).

    Returns a ``SkyComponents`` whose channel axis is the moment axis
    (``flux [ncomp, nmoment, npol]``, frequency = reference frequency),
    computed via the pseudo-inverse of the channel-moment coupling.
    """
    ref = _reference_frequency(sc.frequency, reference_frequency)
    w = moment_weights(sc.frequency, ref, nmoment)  # [nchan, nmoment]
    pinv = jnp.linalg.pinv(w, rcond=1e-7)  # [nmoment, nchan]
    flux_m = jnp.einsum(
        "mc,kcp->kmp", pinv.astype(sc.flux.dtype), sc.flux
    )
    return sc.replace(
        flux=flux_m, frequency=jnp.full((nmoment,), ref)
    )


def interpolate_skycomponents_frequency(
    sc: SkyComponents, nmoment: int = 1, reference_frequency=None
) -> SkyComponents:
    """Smooth component fluxes by a degree-(nmoment-1) polynomial fit in
    fractional frequency (sky_component/taylor_terms.py:156-190).

    One batched least-squares projection: flux -> V pinv(V) flux with V
    the [nchan, nmoment] Vandermonde in (nu - nu_ref)/nu_ref.
    """
    ref = _reference_frequency(sc.frequency, reference_frequency)
    v = moment_weights(sc.frequency, ref, nmoment)  # [nchan, nmoment]
    proj = (v @ jnp.linalg.pinv(v)).astype(sc.flux.dtype)  # [nchan, nchan]
    return sc.replace(flux=jnp.einsum("dc,kcp->kdp", proj, sc.flux))


def transpose_skycomponents_to_channels(
    sc: SkyComponents,
) -> List[SkyComponents]:
    """[source, chan] -> [chan][source] decomposition
    (sky_component/taylor_terms.py:193-212)."""
    return [
        sc.replace(
            flux=sc.flux[:, chan : chan + 1, :],
            frequency=sc.frequency[chan : chan + 1],
        )
        for chan in range(sc.nchan)
    ]


def gather_skycomponents_from_channels(
    sc_list: List[SkyComponents],
) -> SkyComponents:
    """[chan][source] -> [source, chan] recombination
    (sky_component/taylor_terms.py:215-241)."""
    flux = jnp.concatenate([sc.flux for sc in sc_list], axis=1)
    frequency = jnp.concatenate([sc.frequency for sc in sc_list])
    return sc_list[0].replace(flux=flux, frequency=frequency)


def find_skycomponents_frequency_taylor_terms(
    dirty_list, nmoment: int = 1, reference_frequency=None, **kwargs
) -> List[SkyComponents]:
    """Find components on the moment-0 image, fit per-channel fluxes, and
    smooth them with a frequency polynomial
    (sky_component/taylor_terms.py:83-153).

    :param dirty_list: list of single-channel Images (one per frequency)
    :return: per-channel list of SkyComponents ([chan][source])
    """
    from .skycomponent_ops import find_skycomponents, fit_skycomponent
    from .taylor import calculate_frequency_taylor_terms_from_image_list

    frequency = np.array(
        [float(np.asarray(d.frequency)[0]) for d in dirty_list]
    )
    ref = _reference_frequency(frequency, reference_frequency)
    moment0_list = calculate_frequency_taylor_terms_from_image_list(
        dirty_list, nmoment=1, reference_frequency=ref
    )
    threshold = kwargs.get("component_threshold", np.inf)
    try:
        found = find_skycomponents(moment0_list[0], threshold=threshold)
    except ValueError:
        return []
    if found is None or found.ncomp == 0:
        return []
    # per-channel flux refit at each found position (one small host-side
    # Gaussian fit per source per channel, as in the reference)
    fit_kwargs = {
        k: v for k, v in kwargs.items() if k != "component_threshold"
    }
    flux = jnp.stack(
        [
            jnp.stack(
                [
                    fit_skycomponent(
                        d, found.select([k]), **fit_kwargs
                    ).flux[0, 0, :]
                    for d in dirty_list
                ]
            )
            for k in range(found.ncomp)
        ]
    )  # [ncomp, nchan, npol]
    full = found.replace(flux=flux, frequency=jnp.asarray(frequency))
    smoothed = interpolate_skycomponents_frequency(
        full, nmoment=nmoment, reference_frequency=ref
    )
    return transpose_skycomponents_to_channels(smoothed)
