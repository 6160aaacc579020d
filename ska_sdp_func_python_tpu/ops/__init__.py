"""Compute kernels and operations (framework L2/L3)."""

from .fft import fft, ifft, pad_mid, extract_mid, extract_oversampled
from .pswf import coordinates, coordinates2, grdsf, w_beam
from .dft import (
    dft_kernel,
    dft_skycomponent_visibility,
    extract_direction_and_flux,
    idft_visibility_skycomponent,
)
from .visibility_ops import (
    calculate_visibility_phasor,
    phaserotate_visibility,
    concatenate_visibility,
    subtract_visibility,
    divide_visibility,
    remove_continuum_visibility,
    integrate_visibility_by_channel,
    average_visibility_by_channel,
    convert_visibility_to_stokes,
    convert_visibility_to_stokesI,
    convert_visibility_stokesI_to_polframe,
    expand_polarizations,
)

__all__ = [
    "fft",
    "ifft",
    "pad_mid",
    "extract_mid",
    "extract_oversampled",
    "coordinates",
    "coordinates2",
    "grdsf",
    "w_beam",
    "dft_kernel",
    "dft_skycomponent_visibility",
    "extract_direction_and_flux",
    "idft_visibility_skycomponent",
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
