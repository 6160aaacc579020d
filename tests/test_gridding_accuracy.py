"""Accuracy-envelope pins (VERDICT round-2 item 6): the plan-path
gridder's best-achievable eps at the standard support-8 configuration,
for the three coordinate-precision regimes:

- f32 coordinates: positional quantisation ~(npad/2) eps_32 pixels
- f64-native (x64): payload taps evaluated at f64 positions
- compensated: split (hi, lo) f32 coordinate pairs, host f64 pixel math
  — the mode an f32-only TPU uses (make_imaging_plan auto-selects it
  for host numpy f64 coordinates when x64 is off)

Oracle: host-f64 DFT. The envelope sweep lives in bench_accuracy.py.
"""

import numpy as np
import jax.numpy as jnp

from ska_sdp_func_python_tpu.ops.imaging import (
    make_imaging_plan,
    predict_with_plan,
)

NPIX = 128
CELL = 4e-4
NW = 16
NVIS = 8000


def _setup(rng):
    scale = NPIX * CELL
    umax = 0.33 * NPIX / scale / 2
    u = rng.uniform(-umax, umax, NVIS)
    v = rng.uniform(-umax, umax, NVIS)
    w = rng.uniform(-30.0, 30.0, NVIS)
    px = np.array([88, 40, 70])
    py = np.array([50, 90, 64])
    flux = np.array([1.0, 0.7, 1.3])
    l = -(px - NPIX // 2) * CELL
    m = (py - NPIX // 2) * CELL
    n1 = np.sqrt(1.0 - l**2 - m**2) - 1.0
    model = np.zeros((NPIX, NPIX), np.float32)
    model[py, px] = flux
    ph = (-2.0 * np.pi) * (
        np.outer(u, l) + np.outer(v, m) + np.outer(w, n1)
    )
    exact = np.cos(ph) @ flux + 1j * (np.sin(ph) @ flux)
    return u, v, w, jnp.asarray(model), exact


def _eps(plan, model, exact):
    pv = np.asarray(predict_with_plan(plan, model)).astype(complex)
    return float(np.max(np.abs(pv - exact)) / np.max(np.abs(exact)))


class TestAccuracyEnvelope:
    def test_f32_vs_f64_vs_compensated(self, rng):
        u, v, w, model, exact = _setup(rng)
        kw = dict(
            npixel=NPIX, cellsize=CELL, support=8, nw=NW, padding=2.0
        )
        plan32 = make_imaging_plan(
            u.astype(np.float32), v.astype(np.float32),
            w.astype(np.float32), **kw,
        )
        eps32 = _eps(plan32, model, exact)
        plan64 = make_imaging_plan(
            jnp.asarray(u), jnp.asarray(v), jnp.asarray(w), **kw
        )
        eps64 = _eps(plan64, model, exact)
        planc = make_imaging_plan(u, v, w, compensated=True, **kw)
        epsc = _eps(planc, model, exact)
        # pins (2x headroom over measured: f32 ~8e-6 at 128^2, f64-native
        # ~1.5e-6, compensated within 2.5x of f64-native — the residual
        # f32 FFT/correction floor is shared)
        assert eps32 < 2e-5, eps32
        assert eps64 < 4e-6, eps64
        assert epsc < 8e-6, epsc
        assert eps64 <= eps32, (eps64, eps32)
        assert epsc <= eps32, (epsc, eps32)

    def test_compensated_roundtrip_invert(self, rng):
        """Compensated plans drive the full invert too (taps only —
        no runtime cost): PSF peak lands exactly at the centre."""
        from ska_sdp_func_python_tpu.ops.imaging import invert_with_plan

        u, v, w, model, exact = _setup(rng)
        plan = make_imaging_plan(
            u, v, w, npixel=NPIX, cellsize=CELL, support=8, nw=NW,
            padding=1.25, compensated=True,
        )
        ones = jnp.ones(NVIS, jnp.complex64)
        dirty, swt = invert_with_plan(plan, ones)
        img = np.asarray(dirty) / float(swt)
        iy, ix = np.unravel_index(np.argmax(img), img.shape)
        assert (iy, ix) == (NPIX // 2, NPIX // 2), (iy, ix)
        assert abs(img[iy, ix] - 1.0) < 1e-3


class TestDeepRegime:
    def test_tiled_f64_epsilon(self, rng):
        """The XLA tiled path under x64 is dtype-following f64 end to
        end (complex128 FFTs): the deep-precision regime serving the
        reference's ducc0 eps<=1e-12 contract (ng.py:59). Measured
        1.2e-7 at support 12 / nw 64; the limiting term is the
        second-order w-interpolation, which keeps falling with nw."""
        from ska_sdp_func_python_tpu.ops.imaging import predict_core

        n = 8000
        npix, cell = 128, 4e-4
        scale = npix * cell
        umax = 0.33 * npix / scale / 2
        u = rng.uniform(-umax, umax, n)
        v = rng.uniform(-umax, umax, n)
        w = rng.uniform(-30.0, 30.0, n)
        px, py = 88, 50
        model = np.zeros((npix, npix))
        model[py, px] = 1.0
        l = -(px - npix // 2) * cell
        m = (py - npix // 2) * cell
        n1 = np.sqrt(1 - l * l - m * m) - 1
        ph = -2 * np.pi * (u * l + v * m + w * n1)
        exact = np.cos(ph) + 1j * np.sin(ph)
        pv = np.asarray(
            predict_core(
                jnp.asarray(u), jnp.asarray(v), jnp.asarray(w),
                jnp.asarray(model), cellsize=cell, support=12, nw=64,
                do_wstacking=True, gridder="tiled",
            )
        )
        assert pv.dtype == np.complex128
        eps = float(np.max(np.abs(pv - exact)))
        assert eps < 4e-7, eps
