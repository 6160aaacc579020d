"""Generate the per-module API reference (docs/api/*.md).

The reference ships a Sphinx tree (/root/reference/docs/src/*.rst with
per-module autodoc pages); this is the equivalent deliverable for the
TPU framework: one markdown page per subpackage listing every public
symbol with its signature and docstring summary, plus the
reference-module mapping. Deterministic output — regenerate with

    python docs/generate.py

after changing public APIs (tests/test_periphery.py checks the pages
are fresh is NOT enforced; regenerate before releases).
"""

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

HERE = os.path.dirname(os.path.abspath(__file__))

# (module, title, reference counterpart)
MODULES = [
    ("ska_sdp_func_python_tpu.models", "Data models",
     "ska-sdp-datamodels (Visibility/Image/GainTable/SkyComponent)"),
    ("ska_sdp_func_python_tpu.ops.imaging", "Imaging (invert/predict)",
     "imaging/base.py, imaging/imaging.py, imaging/ng.py, imaging/wg.py"),
    ("ska_sdp_func_python_tpu.ops.gridding", "Gridding kernels",
     "grid_data/gridding.py (+ ducc0/wagg internals)"),
    ("ska_sdp_func_python_tpu.ops.gridding_tiled", "Tiled MXU gridder",
     "(no counterpart: TPU-native scatter-free formulation)"),
    ("ska_sdp_func_python_tpu.ops.gridding_fused", "Fused Pallas gridder",
     "(no counterpart: TPU kernel serving the ng/wg backends)"),
    ("ska_sdp_func_python_tpu.ops.gridding_plan", "Gridding plans",
     "(no counterpart: ducc0 re-bins uvw every call)"),
    ("ska_sdp_func_python_tpu.ops.accuracy", "Epsilon resolver",
     "imaging/ng.py epsilon parameter semantics"),
    ("ska_sdp_func_python_tpu.ops.dft", "Direct Fourier transform",
     "sky_component/operations.py dft (cupy/ska-sdp-func backends)"),
    ("ska_sdp_func_python_tpu.ops.solvers", "Gain solver (StefCal)",
     "calibration/solvers.py"),
    ("ska_sdp_func_python_tpu.ops.gain_ops", "Gain apply/algebra",
     "calibration/operations.py, calibration/jones.py"),
    ("ska_sdp_func_python_tpu.ops.calibration_chain", "Chain calibration",
     "calibration/chain_calibration.py"),
    ("ska_sdp_func_python_tpu.ops.gaincal_engine", "DP3-style engine",
     "calibration/dp3_calibration.py (native equivalent)"),
    ("ska_sdp_func_python_tpu.ops.beamformer_utils", "Beamformer utils",
     "calibration/beamformer_utils.py"),
    ("ska_sdp_func_python_tpu.ops.cleaners", "CLEAN minor cycles",
     "image/cleaners.py (+ radler equivalent)"),
    ("ska_sdp_func_python_tpu.ops.deconvolution", "Deconvolution drivers",
     "image/deconvolution.py"),
    ("ska_sdp_func_python_tpu.ops.image_ops", "Image operations",
     "image/operations.py, image/gather_scatter.py helpers"),
    ("ska_sdp_func_python_tpu.ops.image_iterators", "Image iterators",
     "image/iterators.py"),
    ("ska_sdp_func_python_tpu.ops.taylor", "Image Taylor/moments",
     "image/taylor_terms.py"),
    ("ska_sdp_func_python_tpu.ops.weighting", "Weighting/tapers",
     "imaging/weighting.py"),
    ("ska_sdp_func_python_tpu.ops.imaging_helpers", "Invert/predict reductions",
     "imaging/imaging_helpers.py"),
    ("ska_sdp_func_python_tpu.ops.visibility_ops", "Visibility operations",
     "visibility/base.py, visibility/operations.py"),
    ("ska_sdp_func_python_tpu.ops.visibility_geometry",
     "Visibility geometry", "visibility/visibility_geometry.py"),
    ("ska_sdp_func_python_tpu.ops.skycomponent_ops", "Sky components",
     "sky_component/operations.py"),
    ("ska_sdp_func_python_tpu.ops.skycomponent_taylor",
     "Sky-component Taylor", "sky_component/taylor_terms.py"),
    ("ska_sdp_func_python_tpu.ops.skymodel_imaging", "SkyModel imaging",
     "sky_model/skymodel_imaging.py"),
    ("ska_sdp_func_python_tpu.ops.griddata_ops", "GridData/awprojection",
     "grid_data/{gridding,convolution_functions}.py"),
    ("ska_sdp_func_python_tpu.ops.fft", "FFT support",
     "fourier_transforms/fft_support.py"),
    ("ska_sdp_func_python_tpu.ops.pswf", "PSWF / w-beam",
     "fourier_transforms/fft_coordinates.py"),
    ("ska_sdp_func_python_tpu.ops.permute", "Benes permutation engine",
     "(no counterpart: TPU fixed-permutation primitive)"),
    ("ska_sdp_func_python_tpu.utils.coordinates", "Coordinate support",
     "util/coordinate_support.py"),
    ("ska_sdp_func_python_tpu.utils.geometry", "Geometry utils",
     "util/geometry.py"),
    ("ska_sdp_func_python_tpu.utils.arrays", "Array functions",
     "util/array_functions.py"),
    ("ska_sdp_func_python_tpu.pipeline", "Pipelines (ICAL/continuum)",
     "(reference leaves major cycles to external frameworks)"),
    ("ska_sdp_func_python_tpu.parallel", "Distributed execution",
     "(no counterpart: reference is single-process under dask)"),
    ("ska_sdp_func_python_tpu.streaming", "Out-of-core streaming",
     "(no counterpart: DP3 DPBuffer streaming role)"),
    ("ska_sdp_func_python_tpu.io", "Native IO / gain interop",
     "h5parm ecosystem (losoto/DP3), casacore MS role"),
    ("ska_sdp_func_python_tpu.config", "Precision/config policy",
     "(global f64 in the reference)"),
]


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _summary(obj):
    doc = inspect.getdoc(obj) or ""
    first = doc.strip().split("\n\n")[0].replace("\n", " ")
    return first[:300]


def page(modname, title, refmap):
    mod = importlib.import_module(modname)
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in dir(mod) if not n.startswith("_")]
    lines = [
        f"# {title}",
        "",
        f"Module: `{modname}`",
        "",
        f"Reference counterpart: {refmap}",
        "",
        _summary(mod),
        "",
    ]
    for n in sorted(set(names)):
        obj = getattr(mod, n, None)
        if obj is None:
            continue
        if inspect.ismodule(obj):
            continue
        if inspect.isclass(obj):
            lines.append(f"## class `{n}`")
            lines.append("")
            lines.append(_summary(obj))
            lines.append("")
            for mn, mo in inspect.getmembers(obj):
                if mn.startswith("_") or not callable(mo):
                    continue
                if not (
                    inspect.isfunction(mo) or inspect.ismethod(mo)
                ):
                    continue
                lines.append(f"- `{mn}{_sig(mo)}`")
            lines.append("")
        elif callable(obj):
            lines.append(f"## `{n}{_sig(obj)}`")
            lines.append("")
            lines.append(_summary(obj))
            lines.append("")
        else:
            lines.append(f"## `{n}` (constant)")
            lines.append("")
    return "\n".join(lines) + "\n"


def main():
    api = os.path.join(HERE, "api")
    os.makedirs(api, exist_ok=True)
    index = [
        "# ska-sdp-func-python-tpu — API reference",
        "",
        "One page per module; every public symbol with its signature and",
        "docstring summary, and the reference (ska-sdp-func-python)",
        "module it serves. Regenerate with `python docs/generate.py`.",
        "",
        "| page | module | reference counterpart |",
        "|---|---|---|",
    ]
    for modname, title, refmap in MODULES:
        fn = modname.split(".", 1)[1].replace(".", "_") + ".md"
        with open(os.path.join(api, fn), "w") as fh:
            fh.write(page(modname, title, refmap))
        index.append(f"| [{title}](api/{fn}) | `{modname}` | {refmap} |")
        print(f"wrote docs/api/{fn}")
    with open(os.path.join(HERE, "index.md"), "w") as fh:
        fh.write("\n".join(index) + "\n")
    print("wrote docs/index.md")


if __name__ == "__main__":
    main()
