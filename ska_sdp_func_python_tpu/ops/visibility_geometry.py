"""Visibility geometry wrappers (framework L3, C15).

Equivalents of /root/reference/src/ska_sdp_func_python/visibility/
visibility_geometry.py: thin wrappers of utils/geometry.py over Visibility
attributes. ``location`` is (lat, lon, alt) in (rad, rad, m).
"""

from __future__ import annotations

from ..models.visibility import Visibility
from ..utils.geometry import (
    calculate_azel,
    calculate_hourangles,
    calculate_parallactic_angles,
    calculate_transit_time,
)

__all__ = [
    "calculate_visibility_hourangles",
    "calculate_visibility_parallactic_angles",
    "calculate_visibility_azel",
    "calculate_visibility_transit_time",
]


def calculate_visibility_hourangles(vis: Visibility, location):
    """(visibility_geometry.py:46-58)."""
    return calculate_hourangles(location, vis.time, vis.phasecentre)


def calculate_visibility_parallactic_angles(vis: Visibility, location):
    """(visibility_geometry.py:26-43)."""
    return calculate_parallactic_angles(location, vis.time, vis.phasecentre)


def calculate_visibility_azel(vis: Visibility, location):
    """(visibility_geometry.py:72-85)."""
    return calculate_azel(location, vis.time, vis.phasecentre)


def calculate_visibility_transit_time(vis: Visibility, location):
    """(visibility_geometry.py:60-70)."""
    return calculate_transit_time(location, vis.time[0], vis.phasecentre)


def get_direction_time_location(bvis: Visibility):
    """(location, utc time, phase direction) triple used by the geometry
    helpers (visibility/visibility_geometry.py:24-43)."""
    location = getattr(
        getattr(bvis, "configuration", None), "location", None
    )
    return location, bvis.time, bvis.phasecentre
