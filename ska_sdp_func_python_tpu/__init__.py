"""ska_sdp_func_python_tpu — a TPU-native framework for radio-interferometric
calibration, imaging and deconvolution.

Built from scratch against the capability surface of
ska-telescope/ska-sdp-func-python (see SURVEY.md): batched antenna-gain
calibration (StefCal family), FFT/w-stacking predict & invert, CLEAN-family
deconvolution — all as jit/vmap/shard_map-able JAX on pytree data models,
with Pallas kernels on the hot paths and jax.sharding for multi-chip scale.

Layout:
    models/    pytree data models (Visibility, GainTable, Image, ...)
    ops/       compute kernels and operations (DFT, gridding, solvers, CLEAN)
    parallel/  device-mesh sharding, collectives, distributed pipelines
    utils/     coordinates, geometry, array helpers
"""

__version__ = "0.1.0"

import jax as _jax

# Radio-interferometric phases need true float32 arithmetic: TPU matmuls
# default to bf16 passes (8-bit mantissa), which corrupts DFT phasors and
# gridding kernels. Highest = full f32 accumulation on the MXU.
_jax.config.update("jax_default_matmul_precision", "highest")

from . import models, ops, parallel, utils  # noqa: F401
from . import pipeline  # noqa: F401
