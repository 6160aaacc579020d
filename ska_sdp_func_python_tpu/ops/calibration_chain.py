"""Chain calibration controller (framework L4, C3).

Equivalent of /root/reference/src/ska_sdp_func_python/calibration/
chain_calibration.py: orders multiple Jones-term solves (T/G/B) by a context
string, gating each term on the self-cal iteration number.
"""

from __future__ import annotations

import logging

from ..models.gaintable import GainTable, create_gaintable_from_visibility
from .gain_ops import apply_gaintable
from .solvers import solve_gaintable

log = logging.getLogger("ska-sdp-func-python-tpu")

__all__ = [
    "create_calibration_controls",
    "apply_calibration_chain",
    "calibrate_chain",
    "solve_calibrate_chain",
]


def create_calibration_controls() -> dict:
    """Default chain-calibration controls (chain_calibration.py:27-72):
    T = atmospheric phase, G = electronic gain, B = bandpass."""
    return {
        "T": {
            "shape": "scalar",
            "timeslice": "auto",
            "phase_only": True,
            "first_selfcal": 0,
        },
        "G": {
            "shape": "vector",
            "timeslice": 60.0,
            "phase_only": False,
            "first_selfcal": 0,
        },
        "B": {
            "shape": "vector",
            "timeslice": 1e5,
            "phase_only": False,
            "first_selfcal": 0,
        },
    }


def _as_dict(gaintables, calibration_context):
    if gaintables is None:
        return {}
    if isinstance(gaintables, GainTable):
        gaintables = [gaintables]
    if isinstance(gaintables, dict):
        return dict(gaintables)
    out = {}
    for gaintable in gaintables:
        if gaintable.jones_type in list(calibration_context):
            out[gaintable.jones_type] = gaintable
    return out


def apply_calibration_chain(
    vis,
    gaintables,
    calibration_context: str = "T",
    controls: dict | None = None,
    iteration: int = 0,
):
    """Apply each matching gaintable in context order
    (chain_calibration.py:75-134)."""
    if controls is None:
        controls = create_calibration_controls()
    gt = _as_dict(gaintables, calibration_context)
    for c in gt:
        if iteration >= controls[c]["first_selfcal"]:
            vis = apply_gaintable(vis, gt[c])
    return vis


def calibrate_chain(
    vis,
    model_vis,
    gaintables=None,
    calibration_context: str = "T",
    controls: dict | None = None,
    iteration: int = 0,
    tol: float = 1e-6,
):
    """Solve and apply each Jones term in turn
    (chain_calibration.py:137-222). Returns (corrected vis, dict of
    GainTables)."""
    if controls is None:
        controls = create_calibration_controls()
    avis = vis
    gt = _as_dict(gaintables, calibration_context)
    for c in list(calibration_context):
        if iteration >= controls[c]["first_selfcal"]:
            if c not in gt:
                gt[c] = create_gaintable_from_visibility(
                    avis, timeslice=controls[c]["timeslice"], jones_type=c
                )
            gt[c] = solve_gaintable(
                avis,
                model_vis,
                gain_table=gt[c],
                phase_only=controls[c]["phase_only"],
                crosspol=controls[c]["shape"] == "matrix",
                timeslice=controls[c]["timeslice"],
                tol=tol,
            )
            avis = apply_gaintable(avis, gt[c], inverse=True)
    return avis, gt


def solve_calibrate_chain(
    vis,
    model_vis,
    gaintables=None,
    calibration_context: str = "T",
    controls: dict | None = None,
    iteration: int = 0,
    tol: float = 1e-6,
):
    """Solve (without applying) each Jones term
    (chain_calibration.py:225-320). Returns dict of GainTables."""
    import jax.numpy as jnp

    if controls is None:
        controls = create_calibration_controls()
    gt = _as_dict(gaintables, calibration_context)
    for c in list(calibration_context):
        if c not in gt:
            gt[c] = create_gaintable_from_visibility(
                vis, timeslice=controls[c]["timeslice"], jones_type=c
            )
        if iteration >= controls[c]["first_selfcal"]:
            has_weight = float(jnp.max(jnp.abs(vis.flagged_weight))) > 0.0
            has_model = model_vis is None or (
                float(jnp.max(jnp.abs(model_vis.vis))) > 0.0
            )
            if has_weight and has_model:
                gt[c] = solve_gaintable(
                    vis,
                    model_vis,
                    gain_table=gt[c],
                    phase_only=controls[c]["phase_only"],
                    crosspol=controls[c]["shape"] == "matrix",
                    timeslice=controls[c]["timeslice"],
                    tol=tol,
                )
            else:
                log.info(
                    "No model data: cannot solve for Jones matrix %s", c
                )
    return gt
