"""Pytree data models (framework L0): Visibility, GainTable, Image, GridData,
SkyComponents/SkyModel, and polarisation frames.

Replaces the reference's external ``ska-sdp-datamodels`` xarray Datasets
(SURVEY.md §1 L0) with jit/shard-friendly registered dataclasses.
"""

from .polarisation import (
    PolarisationFrame,
    convert_pol_frame,
    convert_linear_to_stokes,
    convert_stokes_to_linear,
    convert_circular_to_stokes,
    convert_stokes_to_circular,
    convert_linear_to_stokesI,
    convert_circular_to_stokesI,
    convert_stokesI_to_polframe,
    correlate_polarisation,
    congruent_polarisation,
)
from .visibility import Visibility, create_visibility_from_arrays, C_M_S
from .gaintable import GainTable, create_gaintable_from_visibility
from .image import Image, create_image
from .griddata import GridData
from .components import SkyComponents, SkyModel
from .configuration import (
    Configuration,
    create_named_configuration,
    create_visibility,
)

__all__ = [
    "PolarisationFrame",
    "convert_pol_frame",
    "convert_linear_to_stokes",
    "convert_stokes_to_linear",
    "convert_circular_to_stokes",
    "convert_stokes_to_circular",
    "convert_linear_to_stokesI",
    "convert_circular_to_stokesI",
    "convert_stokesI_to_polframe",
    "correlate_polarisation",
    "congruent_polarisation",
    "Visibility",
    "create_visibility_from_arrays",
    "C_M_S",
    "GainTable",
    "create_gaintable_from_visibility",
    "Image",
    "create_image",
    "GridData",
    "SkyComponents",
    "SkyModel",
    "Configuration",
    "create_named_configuration",
    "create_visibility",
]
