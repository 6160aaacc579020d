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

# Persistent compilation cache: imaging-plan / gridder jit signatures take
# 30-400 s to compile on TPU backends; caching makes every later process
# start warm. Opt out with SKA_SDP_TPU_NO_JIT_CACHE=1 or by configuring
# jax_compilation_cache_dir yourself before importing this package.
import os as _os

if (
    not _os.environ.get("SKA_SDP_TPU_NO_JIT_CACHE")
    and _jax.config.jax_compilation_cache_dir is None
    # CPU-pinned runs (tests) gain nothing from the cache, and XLA:CPU
    # AOT entries record pseudo-features (prefer-no-scatter/gather) the
    # loader flags as machine mismatches even on the same host
    and _jax.config.jax_platforms != "cpu"
):
    # Key the cache directory by a host-machine fingerprint: XLA:CPU AOT
    # entries embed machine features (AVX level etc.), and reloading a
    # cache written on different hardware can SIGILL. A per-machine
    # subdirectory keeps TPU-compile reuse on the same host while making
    # cross-machine reuse impossible.
    def _machine_fingerprint() -> str:
        import hashlib
        import platform as _platform

        parts = [_platform.machine(), _platform.system()]
        try:
            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.startswith(("model name", "flags", "Features")):
                        parts.append(line.strip())
                        break
        except OSError:
            pass
        return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.expanduser(
            "~/.cache/ska_sdp_func_python_tpu/jax_cache/" + _machine_fingerprint()
        ),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from . import models, ops, parallel, utils  # noqa: F401
from . import pipeline, streaming  # noqa: F401
