"""Beneš fixed-permutation engine (ops/permute*).

The fused cycle applies the same ~10M permutation every major cycle
(plan order <-> natural order); these tests pin the routing algorithm
(native C++ + Python fallback), the XLA apply, and the Pallas 3-pass
kernel (interpret mode) against direct numpy indexing. Reference
orderings: the ng gridder's internal sort vs the solver's
[time, baseline] layout (imaging/ng.py, calibration/solvers.py).
"""

import numpy as np
import pytest

from ska_sdp_func_python_tpu.ops.permute import (
    _route_py,
    benes_apply,
    benes_plan,
    route_bits,
)
from ska_sdp_func_python_tpu.ops.permute_pallas import benes_apply_tpu


@pytest.fixture(scope="module")
def rngm():
    return np.random.default_rng(77)


@pytest.mark.parametrize("N", [2, 3, 7, 64, 129, 1000, 4096])
def test_apply_matches_gather(rngm, N):
    idx = rngm.permutation(N)
    plan = benes_plan(idx)
    x = rngm.normal(size=N).astype(np.float32)
    y = np.asarray(benes_apply(plan, x))
    assert np.array_equal(y, x[idx])


def test_inverse_roundtrip(rngm):
    N = 1537
    idx = rngm.permutation(N)
    plan = benes_plan(idx)
    x = rngm.normal(size=N).astype(np.float32)
    y = benes_apply(plan, x)
    z = np.asarray(benes_apply(plan, y, inverse=True))
    assert np.array_equal(z, x)


def test_inverse_complex_and_multi_payload(rngm):
    """Regression: the stage loop must re-run for every payload
    component — an exhausted reversed() iterator once left the imag part
    (and extra payloads) unpermuted in inverse mode."""
    N = 198
    idx = rngm.permutation(N)
    plan = benes_plan(idx)
    c = (rngm.normal(size=N) + 1j * rngm.normal(size=N)).astype(
        np.complex64
    )
    x = rngm.normal(size=N).astype(np.float32)
    fc, fx = benes_apply(plan, c, x)
    ic, ix = benes_apply(plan, fc, fx, inverse=True)
    assert np.array_equal(np.asarray(ic), c)
    assert np.array_equal(np.asarray(ix), x)


def test_multi_payload_and_complex(rngm):
    N = 2048
    idx = rngm.permutation(N)
    plan = benes_plan(idx)
    x = rngm.normal(size=N).astype(np.float32)
    c = (rngm.normal(size=N) + 1j * rngm.normal(size=N)).astype(
        np.complex64
    )
    yc, yx = benes_apply(plan, c, x)
    assert np.array_equal(np.asarray(yc), c[idx])
    assert np.array_equal(np.asarray(yx), x[idx])


def test_f64_payload(rngm):
    N = 513
    idx = rngm.permutation(N)
    plan = benes_plan(idx)
    x = rngm.normal(size=N)  # float64 under the x64 test config
    y = np.asarray(benes_apply(plan, x))
    assert np.array_equal(y, x[idx])


def test_python_fallback_matches_native(rngm):
    """native/benes.cpp and the pure-Python routing emit identical bits."""
    N = 256
    n = 8
    idx = rngm.permutation(N)
    dest = np.empty(N, np.int64)
    dest[idx] = np.arange(N)
    native_bits = route_bits(dest)  # uses the C++ lib when available
    py_bits = np.zeros_like(native_bits)
    _route_py(dest, n, py_bits)
    # Both must be VALID routings; they may differ bit-for-bit only if
    # traversal order differs (it doesn't: same algorithm), so assert
    # equality — a divergence means one of them regressed.
    assert np.array_equal(native_bits, py_bits)


@pytest.mark.parametrize("N", [4096, 150000, (1 << 18) - 37])
def test_pallas_matches_xla(rngm, N):
    """3-pass kernel (interpret mode on CPU) is bit-exact vs the XLA
    apply, both directions, including the column pass (n > 17)."""
    idx = rngm.permutation(N)
    plan = benes_plan(idx)
    x = rngm.normal(size=N).astype(np.float32)
    y = np.asarray(benes_apply_tpu(plan, x))
    assert np.array_equal(y, x[idx])
    z = np.asarray(benes_apply_tpu(plan, y, inverse=True))
    assert np.array_equal(z, x)


def test_pallas_complex_pair(rngm):
    N = 100000
    idx = rngm.permutation(N)
    plan = benes_plan(idx)
    c = (rngm.normal(size=N) + 1j * rngm.normal(size=N)).astype(
        np.complex64
    )
    yc = np.asarray(benes_apply_tpu(plan, c))
    assert np.array_equal(yc, c[idx])


def test_rejects_non_permutation():
    with pytest.raises((ValueError, IndexError)):
        benes_plan(np.array([0, 0, 1]))


def test_identity_plan(rngm):
    N = 640
    plan = benes_plan(np.arange(N))
    x = rngm.normal(size=N).astype(np.float32)
    assert np.array_equal(np.asarray(benes_apply(plan, x)), x)
