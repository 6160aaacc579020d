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


@pytest.fixture
def rng():
    return np.random.default_rng(1805550721)
