"""Global dtype/precision policy for the TPU framework.

The reference library (ska-sdp-func-python) computes in complex128/float64
throughout (e.g. /root/reference/src/ska_sdp_func_python/calibration/solvers.py:301).
TPU hardware has no fast float64, so the policy here is:

* Default compute dtypes follow ``jax.config.jax_enable_x64``: complex64/float32
  on TPU, complex128/float64 when x64 is enabled (CPU tests, golden parity runs).
* All kernels are dtype-polymorphic: they derive working dtypes from their
  inputs via the helpers below rather than hard-coding a precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "real_dtype",
    "complex_dtype",
    "default_real",
    "default_complex",
    "czeros",
    "zeros_like_safe",
    "expi",
    "frac_dot_turns",
    "gridder_precision",
    "set_gridder_precision",
    "grid_family",
    "set_grid_family",
    "invert_tail",
    "set_invert_tail",
    "use_benes",
    "set_use_benes",
    "plan_cache_size",
    "set_plan_cache_size",
]

# Automatic gridding-plan cache in invert_visibility/predict_visibility:
# number of (uvw, geometry) plans kept alive keyed on uvw/frequency buffer
# identity. Each cached plan holds the sorted payload on device (~100 B
# per visibility), so the default is small; 0 disables auto caching.
_PLAN_CACHE_SIZE: int = 2


def plan_cache_size() -> int:
    return _PLAN_CACHE_SIZE


def set_plan_cache_size(n: int) -> None:
    global _PLAN_CACHE_SIZE
    _PLAN_CACHE_SIZE = int(n)
    if _PLAN_CACHE_SIZE <= 0:
        from .ops import imaging as _imaging

        _imaging._PLAN_CACHE.clear()

# In-kernel matmul precision of the fused Pallas gridder/degridder:
# "auto" -> "bf16x3" on accelerators, HIGHEST (inherited global default)
# on CPU; "bf16x3" -> 3-pass bf16 emulation of XLA HIGH (which Mosaic
# does not lower natively); "default" -> single bf16 pass; None ->
# inherit the global default (the package pins
# jax_default_matmul_precision="highest").
# Measured on one v5e at the 10M-vis BASELINE config: bf16x3 is
# image-level indistinguishable from HIGHEST (3.9e-6 relative dirty-image
# difference; both 3.3e-4 vs the exact DFT, dominated by w-interpolation
# method error) at ~0.65x the kernel time; single-pass bf16 degrades the
# image ~6x (2e-3) and is NOT the default anywhere.
# Resolved OUTSIDE the jit caches by the public entry points
# (invert/predict_with_plan wrappers), so setting it between calls
# forces a retrace; lower-level jit'd helpers called with the "config"
# sentinel still bake the value at first trace.
_GRIDDER_PRECISION: str | None = "auto"


def gridder_precision(override=("config",)) -> str | None:
    """Resolve a gridder precision argument against the global policy."""
    p = override
    if p == ("config",) or p == "config":
        p = _GRIDDER_PRECISION
    if p == "auto":
        p = None if jax.default_backend() == "cpu" else "bf16x3"
    return p


def set_gridder_precision(precision: str | None) -> None:
    """Set the fused gridder's in-kernel matmul precision policy
    (None | "bf16x3" | "default" | "highest")."""
    global _GRIDDER_PRECISION
    _GRIDDER_PRECISION = precision


# Padded-grid family selection for the fused gridder. "auto" (default)
# prefers a 7-smooth multiple-of-56 grid within 6% ABOVE the 128-rounded
# base (tile 56 => buf 64 slot panels = exactly four 128-wide MXU lane
# tiles); "base" pins the 128-rounded/tile-64 geometry. Exposed so
# benches can A/B the two geometries and users can pin one for
# round-over-round comparability. Resolved OUTSIDE the jit caches by
# invert_core/predict_core (static ``family`` argument), so setting it
# between calls forces a retrace; plans bake their geometry at build
# time as documented.
_GRID_FAMILY: str = "auto"


def grid_family() -> str:
    return _GRID_FAMILY


# Invert/predict image-transform path: "fft" = batched XLA (i)fft2 at
# npad^2; "matmul" = pruned centred-DFT matmuls npad<->npixel on the MXU
# at Precision.HIGH (bf16x3) — skips the padded-region compute and any
# non-2^k FFT radix penalty (measured 384.5 vs 367.0 Mvis/s on the
# 10M/1024^2 BASELINE invert, one v5e) but ADDS ~2.5e-5 predict error
# over the ~1.4e-6 fft floor. "auto" therefore resolves to "fft"
# everywhere: the default public API keeps the accuracy floor, and the
# ~4.7% throughput of "matmul" is an explicit opt-in
# (set_invert_tail("matmul") / SKA_SDP_TPU_INVERT_TAIL=matmul).
# Resolved OUTSIDE the jit caches (ops.imaging wrapper functions), so
# setting it between calls forces a retrace.
import os as _os

_INVERT_TAIL: str = _os.environ.get("SKA_SDP_TPU_INVERT_TAIL", "auto")


def invert_tail() -> str:
    if _INVERT_TAIL == "auto":
        return "fft"
    return _INVERT_TAIL


def set_invert_tail(tail: str) -> None:
    if tail not in ("auto", "fft", "matmul"):
        raise ValueError(
            f"invert_tail must be 'auto', 'fft' or 'matmul', got {tail!r}"
        )
    global _INVERT_TAIL
    _INVERT_TAIL = tail


# Beneš fixed-permutation engine in the fused self-cal cycle: replaces
# the two per-cycle ~33 ms lax.sort permutation applies (plan order <->
# solver natural order) with precomputed butterfly networks
# (ops/permute.py). "auto" = on when the native routing library builds
# (plan-build cost ~19 s at 10M entries, paid once per workspace);
# "off" = always lax.sort; "on" = require it (raises if unavailable).
_USE_BENES: str = _os.environ.get("SKA_SDP_TPU_BENES", "auto")


def use_benes() -> str:
    return _USE_BENES


def set_use_benes(mode: str) -> None:
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"use_benes must be auto/on/off, got {mode!r}")
    global _USE_BENES
    _USE_BENES = mode


def set_grid_family(family: str) -> None:
    if family not in ("auto", "base"):
        raise ValueError(f"grid_family must be 'auto' or 'base', got {family!r}")
    global _GRID_FAMILY
    _GRID_FAMILY = family


def default_real() -> jnp.dtype:
    """Default real dtype under the current x64 setting."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_complex() -> jnp.dtype:
    """Default complex dtype under the current x64 setting."""
    return jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64


def real_dtype(*arrays) -> jnp.dtype:
    """Real dtype matching the highest precision among ``arrays``."""
    for a in arrays:
        if a is not None and jnp.asarray(a).dtype in (
            jnp.float64,
            jnp.complex128,
        ):
            return jnp.float64
    return default_real() if not arrays else jnp.float32


def complex_dtype(*arrays) -> jnp.dtype:
    """Complex dtype matching the highest precision among ``arrays``."""
    for a in arrays:
        if a is not None and jnp.asarray(a).dtype in (
            jnp.float64,
            jnp.complex128,
        ):
            return jnp.complex128
    return default_complex() if not arrays else jnp.complex64


def czeros(shape, dtype=None):
    """Complex zeros built from real parts on device.

    ``jnp.zeros(shape, complex)`` materialises a complex scalar constant on
    the host, which some backends (the axon TPU tunnel) cannot transfer;
    composing via ``lax.complex`` keeps everything device-side.
    """
    if dtype is None:
        dtype = default_complex()
    r = jnp.float64 if dtype == jnp.complex128 else jnp.float32
    z = jnp.zeros(shape, dtype=r)
    return jax.lax.complex(z, z).astype(dtype)


def zeros_like_safe(x):
    """zeros_like that avoids host-side complex scalar constants."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return x * 0.0
    return jnp.zeros_like(x)


def expi(phase):
    """exp(1j * phase) without a host-side complex scalar constant
    (axon-tunnel safe): lax.complex(cos, sin)."""
    phase = jnp.asarray(phase)
    return jax.lax.complex(jnp.cos(phase), jnp.sin(phase))


def frac_dot_turns(a, b):
    """Fractional part, in turns, of ``sum_k a[..., k] * b[..., k]``.

    Interferometric phases span thousands of turns (uvw up to ~1e5
    wavelengths), so a plain f32 dot followed by cos/sin loses
    ``|phase| * eps`` — the measured ~1e-4 on-chip visibility error. Here
    each product is computed as four error-free partials via Dekker's
    12-bit split (hi*hi, hi*lo, lo*hi exact in f32; lo*lo negligible) and
    each partial is reduced mod 1 exactly (``x - round(x)`` is exact),
    keeping the summed fraction accurate to a few f32 ulps regardless of
    phase magnitude. In f64 the plain reduced dot is already accurate.

    ``a`` and ``b`` must broadcast against each other with the contraction
    axis last. Returns the dot in turns, reduced to roughly [-2, 2];
    multiply by 2*pi before cos/sin.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if jnp.result_type(a.dtype, b.dtype) == jnp.float64:
        d = jnp.einsum("...s,...s->...", a, b)
        return d - jnp.round(d)

    def frac(x):
        return x - jnp.round(x)

    def split(x):
        c = jnp.float32(4097.0) * x  # 2**12 + 1
        hi = c - (c - x)
        return hi, x - hi

    total = None
    for k in range(a.shape[-1]):
        xh, xl = split(a[..., k].astype(jnp.float32))
        yh, yl = split(b[..., k].astype(jnp.float32))
        t = frac(xh * yh) + frac(xh * yl) + frac(xl * yh) + xl * yl
        total = t if total is None else total + t
    return frac(total)
