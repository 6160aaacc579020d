"""Epsilon-driven gridder parameter selection.

The reference's gridder contract is "give me epsilon, I pick the
parameters" (imaging/ng.py:59 ``epsilon=1e-12``; ng.py:254 switches to
double-precision accumulation below 5e-6). Here the measured accuracy
envelope (README "Gridder accuracy envelope"; bench_accuracy.py;
tests/test_gridding_accuracy.py) is folded into one resolver:
``gridding_params_for_epsilon(eps)`` picks the cheapest (support,
padding, coordinate mode, kernel precision, gridder path) whose
measured non-w error floor fits half the budget, and
``nw_for_epsilon`` scales the w-plane count so the linear
w-interpolation error fits the other half.

Error model (measured, one v5e + CPU x64 oracle):

- The w-interpolation error is ``~E0_W * (nw_est / nw)**2`` where
  ``nw_est = 4 * wmax * fov**2`` is the Cornwell-style heuristic
  (imaging/base.py:699-744): at nw = nw_est the error is a
  shape-independent constant E0_W ~ 4e-5 (verified on three shapes:
  128^2/nw_est 8, 256^2/nw_est ~4, 512^2/nw_est ~5 — all within 1.6x).
- Non-w floors per regime: support-6/padding-1.25 aliasing 3.3e-5;
  support-8 f32 tap/coordinate floor ~1.4e-6 (compensated or f64-native
  coordinates); x64 tiled f64 at support 8/12/16: 1.5e-7 / 3e-8 / 5e-9
  (probed at 128^2 with the w term scaled out; limited by aliasing).

Below ~1e-8 the envelope is unvalidated — the resolver raises instead
of silently under-delivering (the reference's 1e-12 regime needs
exact-w, i.e. per-visibility w phases, which linear interpolation
approaches only as nw -> inf).
"""

from __future__ import annotations

import math
import typing

import jax

__all__ = [
    "GriddingAccuracy",
    "gridding_params_for_epsilon",
    "nw_for_epsilon",
]

# measured w-interpolation error at nw == the heuristic plane count
# (4 * wmax * fov^2); see module docstring
E0_W = 4.0e-5
# same, for the quadratic 3-plane stencil (gridding_tiled w_order=2):
# error ~ E0_W3 * (nw_est / nw)^3; calibrated from the round-4
# measurements (s16/nw64 -> 1.6e-11, s16/nw96 -> 4.7e-12 at 256^2 with
# nw_est ~ 1: E0_W3 = 1.6e-11 * 64^3 ~ 4e-6)
E0_W3 = 4.0e-6


class GriddingAccuracy(typing.NamedTuple):
    """Resolved gridding configuration for a requested epsilon."""

    regime: str
    support: int
    padding: float
    # "device": plan from the Visibility's device coordinates (f32 on
    # chip). "host64": plan from host-numpy f64 coordinates — triggers
    # the compensated split-(hi, lo) mode on f32 devices and f64-native
    # plans under x64, at zero kernel runtime cost.
    coords: str
    # kernel matmul precision override (None = config policy "bf16x3"
    # on TPU, which measures image-level identical to 'highest')
    precision: str | None
    # None = default path (fused Pallas on TPU / tiled on CPU);
    # "tiled" = force the dtype-following XLA path (f64 end-to-end
    # under x64 — the deep regimes)
    gridder: str | None
    # measured non-w error floor of this regime (aliasing + coordinate
    # quantisation + tap storage); the w budget is handled by nw
    floor_eps: float
    requires_x64: bool = False
    # requested epsilon this resolution serves (set by the resolver)
    epsilon: float = 0.0
    # w-interpolation order: "linear" (2-plane) or "quadratic" (3-plane
    # Lagrange, tiled path; third-order error — the round-4 addition
    # that closes the gap to the reference's epsilon=1e-12 contract)
    w_interp: str = "linear"

    @property
    def nw_min(self) -> int:
        """Minimum w-plane count for this resolution given the
        heuristic estimate 1 (callers with a real estimate use
        :func:`nw_for_epsilon`)."""
        return nw_for_epsilon(1, self.epsilon) if self.epsilon else 1


# All w-stacked regimes use ES-KERNEL w-gridding (round 5; ducc0's
# improved w-stacking): each vis feeds `support` neighbouring planes
# with ES weights and the image is divided by the w-kernel transform at
# wstep*(n-1). Unlike the earlier linear/quadratic interpolation laws —
# whose error grows as (wstep*(n-1))^order and so UNDER-DELIVERED by
# >100x for sources toward the image edge (adversarial case,
# tests/test_accuracy_api.py) — the kernel bounds the w error uniformly
# over the field at its aliasing floor, with tiny plane counts
# (~sigma_w*4*wmax*(fov/2)^2 + support). Measured edge-source floors vs
# the exact DFT (256^2, 5000 vis, w +-1200 wl, sigma_w=2): s8 1.5e-7,
# s12 2.6e-11, s16 4.7e-13 (floors below keep 2-4x margin).
# f32 floors are EDGE-SOURCE measurements (512^2, source at 70% of the
# half-field, vs host-f64 DFT): aliasing and the former coordinate
# quantisation both grow toward the field edge, so the old
# benign-position floors under-promised there. Compensated (hi, lo)
# pixel coordinates, ON CHIP (one v5e, bench_accuracy_chip.py):
# s8/pad1.25 1.17e-5, s8/pad2.0 6.8e-6 (the TPU 'highest' matmul
# emulation adds ~2.5x over the CPU-f32 arithmetic floor of 1.8e-6).
# fast-f32 keeps device coordinates and is aliasing-dominated at the
# edge (2.8e-4). The precise row's floor is set at 5e-6 so epsilon=1e-5
# resolves on chip — delivered 6.8e-6 <= 1e-5 at the field edge (the
# floor<=eps/2 budget split is conservative for the kernel-bounded w
# term, which is not additive with the uv floor).
_REGIMES = (
    GriddingAccuracy(
        "fast-f32", 6, 1.25, "device", None, None, 3.0e-4,
        w_interp="eskernel",
    ),
    GriddingAccuracy(
        "compensated-f32", 8, 1.25, "host64", None, None, 1.2e-5,
        w_interp="eskernel",
    ),
    GriddingAccuracy(
        "precise-f32", 8, 2.0, "host64", "highest", None, 5.0e-6,
        w_interp="eskernel",
    ),
    GriddingAccuracy(
        "deep-f64", 8, 2.0, "host64", "highest", "tiled", 1.5e-7, True,
        w_interp="eskernel",
    ),
    GriddingAccuracy(
        "deep-f64-s12", 12, 2.0, "host64", "highest", "tiled", 5e-11,
        True, w_interp="eskernel",
    ),
    GriddingAccuracy(
        "deep-f64-s16", 16, 2.0, "host64", "highest", "tiled", 2e-12,
        True, w_interp="eskernel",
    ),
)
_N_F32 = 3  # first three regimes run on f32 devices


def nw_for_epsilon(
    nw_est: int, epsilon: float, w_interp: str = "linear"
) -> int:
    """W-plane count so the w-interpolation error fits half the
    ``epsilon`` budget: ``nw = nw_est * (E0 / (epsilon/2))^(1/order+1)``
    — square-root law for the linear stencil, cube-root for quadratic.

    :param nw_est: the heuristic estimate (``_nw_for``'s
        ``4*wmax*fov^2`` Cornwell-style count) for the actual
        coordinates being gridded.
    """
    if w_interp == "quadratic":
        if epsilon >= 2 * E0_W3:
            return max(int(nw_est), 3)
        return max(
            int(math.ceil(nw_est * (E0_W3 / (0.5 * epsilon)) ** (1 / 3))),
            int(nw_est),
            3,
        )
    if epsilon >= 2 * E0_W:
        return max(int(nw_est), 1)
    return max(
        int(math.ceil(nw_est * math.sqrt(E0_W / (0.5 * epsilon)))),
        int(nw_est),
        2,
    )


def gridding_params_for_epsilon(
    epsilon: float, *, do_wstacking: bool = True
) -> GriddingAccuracy:
    """Map a requested gridding tolerance to measured parameters.

    Picks the cheapest regime whose measured non-w floor is at most
    ``epsilon/2`` (the other half of the budget goes to the w-plane
    count — see :func:`nw_for_epsilon`); for 2d imaging
    (``do_wstacking=False``) the full budget goes to the floor.

    :param epsilon: maximum acceptable relative error vs an exact DFT
        (the reference ng.py ``epsilon`` semantics).
    :raises ValueError: when the request cannot be met — below the f32
        floor without x64, or below the validated f64 envelope.
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")
    x64 = bool(jax.config.jax_enable_x64)
    budget = epsilon if not do_wstacking else 0.5 * epsilon
    n_avail = len(_REGIMES) if x64 else _N_F32
    for regime in _REGIMES[:n_avail]:
        if regime.floor_eps <= budget:
            return regime._replace(epsilon=epsilon)
    if not x64:
        raise ValueError(
            f"epsilon={epsilon:g} is below the f32 device floor "
            f"(~{_REGIMES[_N_F32 - 1].floor_eps:g} field-wide: f32 FFT "
            "error + f32 tap storage). Enable jax_enable_x64 to unlock "
            "the deep double-precision regimes (validated to ~1e-11)."
        )
    raise ValueError(
        f"epsilon={epsilon:g} is below the validated envelope "
        f"(~{_REGIMES[-1].floor_eps:g} at support 16 with quadratic "
        "w-interpolation under x64 — the reference's 1e-12 regime). "
        "Below that, raise nw manually (quadratic error falls as "
        "~1/nw^3) or use do_wstacking=False for 2d fields."
    )
