"""Test configuration.

Tests run on a virtual 8-device CPU mesh with float64 enabled, so numerical
parity against the reference's complex128 results can be asserted tightly
(SURVEY.md §4). The same code paths run in float32 on real TPU.
"""

import os
import sys

# Force CPU for tests (the ambient environment points JAX at a remote TPU
# tunnel via JAX_PLATFORMS=axon; tests want the virtual 8-device CPU mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's patched jax prepends the 'axon' remote-TPU platform even
# when JAX_PLATFORMS=cpu is set; override via config to pin tests to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# XLA-CPU accumulated-compile-state crash guard.
#
# Bug signature (reproduced 3x in round 3, again in round 4): after ~190
# tests' worth of accumulated jit compile state, the XLA CPU compiler
# aborts ("Fatal Python error: Aborted", no Python traceback) on the next
# LARGE compile — first seen at test_parallel's 8-device SPMD cube compile
# (~82% of the suite), then at test_multihost's streamed-cycle compile.
# Every affected test passes standalone; only cumulative compiler-heap
# state triggers it. Rounds 3-4 worked around it with per-module
# jax.clear_caches() fixtures (whack-a-mole: each new heavy module
# re-discovered the crash at the tail of a 20-minute run).
#
# Policy here: drop the jit caches at the first MODULE boundary after
# every _CLEAR_EVERY tests. This bounds accumulated compile state for any
# current or future module ordering, costs only the recompiles a module
# boundary implies anyway, and replaces the module-local fixtures.
# ---------------------------------------------------------------------------
_CLEAR_EVERY = 50
_cache_guard = {"since_clear": 0, "module": None}


def pytest_runtest_setup(item):
    mod = getattr(item, "module", None)
    name = getattr(mod, "__name__", None)
    if name != _cache_guard["module"]:
        _cache_guard["module"] = name
        if _cache_guard["since_clear"] >= _CLEAR_EVERY:
            jax.clear_caches()
            _cache_guard["since_clear"] = 0
    _cache_guard["since_clear"] += 1


@pytest.fixture
def rng():
    return np.random.default_rng(1805550721)
