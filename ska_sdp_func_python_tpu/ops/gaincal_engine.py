"""Parset-driven calibration engine (framework L4, C6).

The reference bridges to the external C++ DP3 ``gaincal`` step
(/root/reference/src/ska_sdp_func_python/calibration/dp3_calibration.py):
it builds a parset from the T/G/B calibration controls and streams
visibility buffers through DP3. Here the same parset-style contract is
served *natively* by the framework's batched StefCal solver (SURVEY.md §2b:
"The framework's own batched gain solver replaces this entirely") — same
control vocabulary (caltype, solint, nchan), no external process, fully
jitted.
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from ..models.visibility import Visibility
from .calibration_chain import create_calibration_controls
from .gain_ops import apply_gaintable
from .solvers import solve_gaintable

log = logging.getLogger("ska-sdp-func-python-tpu")

__all__ = ["Parset", "create_parset_from_context", "gaincal"]


@dataclasses.dataclass
class Parset:
    """Minimal parset: ordered key/value pairs (dp3_calibration.py:21-85)."""

    entries: dict = dataclasses.field(default_factory=dict)

    def add(self, key: str, value: str):
        self.entries[key] = value

    def get(self, key: str, default=None):
        return self.entries.get(key, default)


def create_parset_from_context(
    vis: Visibility,
    calibration_context: str,
    global_solution: bool = True,
    solutions_filename: str = "gaincal.h5",
    skymodel_filename: str = "skymodel.db",
) -> list:
    """Build one parset per Jones term from the calibration controls
    (dp3_calibration.py:21-85)."""
    parsets = []
    controls = create_calibration_controls()
    for c in list(calibration_context):
        parset = Parset()
        parset.add("gaincal.parmdb", solutions_filename)
        parset.add("gaincal.sourcedb", skymodel_filename)
        timeslice = controls[c]["timeslice"]
        if timeslice == "auto" or timeslice is None:
            parset.add("gaincal.solint", "1")
        else:
            dt = float(np.asarray(vis.integration_time)[0])
            parset.add(
                "gaincal.solint", str(int(np.round(timeslice / dt)))
            )
        if global_solution:
            parset.add("gaincal.nchan", "0")
        else:
            parset.add("gaincal.nchan", "1")
        parset.add("gaincal.applysolution", "true")
        if controls[c]["phase_only"]:
            caltype = {
                "scalar": "scalarphase",
                "vector": "diagonalphase",
                "matrix": "fulljones",
            }[controls[c]["shape"]]
        else:
            caltype = {
                "scalar": "scalar",
                "vector": "diagonal",
                "matrix": "fulljones",
            }[controls[c]["shape"]]
        parset.add("gaincal.caltype", caltype)
        parset.add("gaincal.jones", c)
        parsets.append(parset)
    return parsets


def gaincal(
    vis: Visibility,
    modelvis: Visibility | None,
    calibration_context: str = "T",
    global_solution: bool = True,
    niter: int = 50,
    tol: float = 1e-6,
) -> Visibility:
    """Parset-driven gain calibration applying solutions in sequence —
    the native equivalent of ``dp3_gaincal`` (dp3_calibration.py:88-200)."""
    parsets = create_parset_from_context(
        vis, calibration_context, global_solution
    )
    controls = create_calibration_controls()
    out = vis
    for parset in parsets:
        c = parset.get("gaincal.jones")
        caltype = parset.get("gaincal.caltype")
        phase_only = caltype in ("scalarphase", "diagonalphase")
        crosspol = caltype == "fulljones"
        jones_type = c if c in ("T", "G", "B") else "T"
        if parset.get("gaincal.nchan") == "1":
            jones_type = "B"
        gt = solve_gaintable(
            out,
            modelvis,
            phase_only=phase_only,
            crosspol=crosspol,
            niter=niter,
            tol=tol,
            jones_type=jones_type,
            timeslice=controls[c]["timeslice"],
        )
        if parset.get("gaincal.applysolution") == "true":
            out = apply_gaintable(out, gt, inverse=True)
    return out


def dp3_gaincal(
    vis,
    calibration_context,
    global_solution=True,
    skymodel_filename=None,
    solutions_filename=None,
    modelvis=None,
    **kwargs,
):
    """Reference-named parset-driven gaincal entry
    (calibration/dp3_calibration.py:88-102): served by the framework's own
    batched solver instead of the external C++ DP3 step. The DP3 skymodel
    file is replaced by an explicit ``modelvis`` (None calibrates against
    a unit point source, DP3's default test model)."""
    return gaincal(
        vis,
        modelvis,
        calibration_context=calibration_context,
        global_solution=global_solution,
        **kwargs,
    )
