"""Load numpy-only modules of the reference library as golden oracles.

The reference at /root/reference cannot run end-to-end here (no astropy /
ska-sdp-datamodels), but several of its numerical kernels are pure numpy:
``fourier_transforms.fft_coordinates``, ``fourier_transforms.fft_support``,
``image.cleaners``, and the private solver kernels in
``calibration.solvers``. Modules are loaded directly from their file paths
(bypassing package ``__init__`` star-imports that would pull in astropy),
with stub modules injected for datamodel imports where needed.

This is differential testing against an oracle, not code reuse.
"""

import importlib.util
import sys
import types

REF = "/root/reference/src/ska_sdp_func_python"


def _load_file(name, path):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_fft_coordinates():
    return _load_file(
        "ref_fft_coordinates", f"{REF}/fourier_transforms/fft_coordinates.py"
    )


def load_fft_support():
    return _load_file(
        "ref_fft_support", f"{REF}/fourier_transforms/fft_support.py"
    )


def load_cleaners():
    return _load_file("ref_cleaners", f"{REF}/image/cleaners.py")


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def load_solvers():
    """Reference calibration.solvers with datamodel imports stubbed.

    Only the private numpy kernels (_solve_antenna_gains_itsubs_*,
    _gain_substitution_*, _solution_residual_*) are usable afterwards.
    """
    if "ref_solvers" in sys.modules:
        return sys.modules["ref_solvers"]
    stubs = {
        "ska_sdp_datamodels": _stub("ska_sdp_datamodels"),
        "ska_sdp_datamodels.calibration": _stub(
            "ska_sdp_datamodels.calibration"
        ),
        "ska_sdp_datamodels.calibration.calibration_create": _stub(
            "ska_sdp_datamodels.calibration.calibration_create",
            create_gaintable_from_visibility=lambda *a, **k: None,
        ),
        "ska_sdp_datamodels.calibration.calibration_model": _stub(
            "ska_sdp_datamodels.calibration.calibration_model",
            GainTable=object,
        ),
        "ska_sdp_datamodels.visibility": _stub(
            "ska_sdp_datamodels.visibility"
        ),
        "ska_sdp_datamodels.visibility.vis_model": _stub(
            "ska_sdp_datamodels.visibility.vis_model", Visibility=object
        ),
        "ska_sdp_func_python.visibility.operations": _stub(
            "ska_sdp_func_python.visibility.operations",
            divide_visibility=lambda *a, **k: None,
        ),
        "ska_sdp_func_python": _stub("ska_sdp_func_python"),
        "ska_sdp_func_python.visibility": _stub(
            "ska_sdp_func_python.visibility"
        ),
    }
    for name, mod in stubs.items():
        sys.modules.setdefault(name, mod)
    return _load_file("ref_solvers", f"{REF}/calibration/solvers.py")
