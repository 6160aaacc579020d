"""M4 deconvolution-driver tests, mirroring the reference's invariants
(tests/image/test_image_deconvolution.py): restore of a unit point == 1,
residual reduction, MSMFS moment round trip."""

import numpy as np
import jax.numpy as jnp
import pytest

from ska_sdp_func_python_tpu.models import create_image
from ska_sdp_func_python_tpu.ops.deconvolution import (
    bound_psf,
    deconvolve_cube,
    find_window,
    fit_psf,
    restore_cube,
)
from ska_sdp_func_python_tpu.ops.taylor import (
    calculate_frequency_taylor_terms_from_image,
    calculate_image_frequency_moments,
    calculate_image_from_frequency_taylor_terms,
)

PC = (0.0, np.deg2rad(-35.0))


def _gauss_psf(n, sigma=2.5):
    iy, ix = np.mgrid[0:n, 0:n]
    r2 = (iy - n // 2) ** 2 + (ix - n // 2) ** 2
    psf = np.exp(-r2 / (2 * sigma**2))
    return psf / psf.max()


def _make_pair(rng, n=128, nchan=1, nsrc=8):
    psf2d = _gauss_psf(n)
    truth = np.zeros((nchan, 1, n, n))
    ys = rng.integers(20, n - 20, nsrc)
    xs = rng.integers(20, n - 20, nsrc)
    for c in range(nchan):
        truth[c, 0, ys, xs] = rng.uniform(0.5, 2.0, nsrc)
    from numpy.fft import fft2, ifft2, ifftshift

    kernel_f = fft2(ifftshift(psf2d))
    dirty = np.real(ifft2(fft2(truth, axes=(-2, -1)) * kernel_f, axes=(-2, -1)))
    psf = np.broadcast_to(psf2d, (nchan, 1, n, n)).copy()
    freq = 1e8 + 1e6 * np.arange(nchan)
    dirty_im = create_image(n, 0.001, PC, frequency=freq)
    psf_im = dirty_im.replace(pixels=jnp.asarray(psf))
    dirty_im = dirty_im.replace(pixels=jnp.asarray(dirty))
    return dirty_im, psf_im, truth


class TestDeconvolveCube:
    def test_hogbom_reduces_residual(self, rng):
        dirty, psf, truth = _make_pair(rng)
        comp, res = deconvolve_cube(
            dirty, psf, algorithm="hogbom", niter=500, gain=0.2,
            fractional_threshold=0.01,
        )
        assert float(jnp.max(jnp.abs(res.pixels))) < 0.3 * float(
            jnp.max(jnp.abs(dirty.pixels))
        )

    def test_msclean_reduces_residual(self, rng):
        dirty, psf, truth = _make_pair(rng)
        comp, res = deconvolve_cube(
            dirty, psf, algorithm="msclean", niter=300, gain=0.7,
            scales=[0, 3, 10], fractional_threshold=0.01,
        )
        assert float(jnp.max(jnp.abs(res.pixels))) < 0.3 * float(
            jnp.max(jnp.abs(dirty.pixels))
        )

    def test_mmclean_multichannel(self, rng):
        dirty, psf, truth = _make_pair(rng, nchan=5, nsrc=4)
        comp, res = deconvolve_cube(
            dirty, psf, algorithm="mmclean", niter=100, gain=0.7,
            nmoment=2, scales=[0, 3], fractional_threshold=0.01,
        )
        assert comp.pixels.shape == dirty.pixels.shape
        assert float(jnp.max(jnp.abs(res.pixels[:, :1]))) < float(
            jnp.max(jnp.abs(dirty.pixels))
        )

    def test_window_quarter(self, rng):
        dirty, psf, _ = _make_pair(rng)
        window = find_window(dirty, "quarter")
        n = dirty.pixels.shape[-1]
        assert float(window[0, 0, n // 2, n // 2]) == 1.0
        assert float(window[0, 0, 1, 1]) == 0.0

    def test_bound_psf(self, rng):
        dirty, psf, _ = _make_pair(rng)
        small = bound_psf(dirty, psf, psf_support=16)
        assert small.pixels.shape[-2:] == (32, 32)


class TestRestore:
    def test_restore_unit_point_peak(self, rng):
        """Reference invariant: restore of a unit point source peaks at 1
        (test_image_deconvolution.py:108-123)."""
        n = 128
        model = create_image(n, 0.001, PC)
        model = model.replace(
            pixels=model.pixels.at[0, 0, n // 2, n // 2].set(1.0)
        )
        psf = model.replace(pixels=jnp.asarray(_gauss_psf(n))[None, None])
        restored = restore_cube(model, psf=psf)
        peak = float(jnp.max(restored.pixels))
        np.testing.assert_allclose(peak, 1.0, atol=1e-7)
        assert restored.clean_beam is not None

    def test_fit_psf_gaussian(self):
        n = 128
        sigma = 3.0
        model = create_image(n, 0.001, PC)
        psf = model.replace(
            pixels=jnp.asarray(_gauss_psf(n, sigma))[None, None]
        )
        beam = fit_psf(psf)
        to_mm = np.sqrt(8 * np.log(2))
        expected_deg = np.rad2deg(sigma * 0.001 * to_mm)
        np.testing.assert_allclose(beam["bmaj"], expected_deg, rtol=1e-3)
        np.testing.assert_allclose(beam["bmin"], expected_deg, rtol=1e-3)


class TestTaylor:
    def test_moment_roundtrip(self, rng):
        """Moments of a low-order spectral cube reconstruct exactly."""
        n, nchan, nmoment = 32, 8, 3
        freq = 1e8 * (1 + 0.01 * np.arange(nchan))
        im = create_image(n, 0.001, PC, frequency=freq)
        # cube that is exactly quadratic in (nu-nu_ref)/nu_ref
        w = np.asarray(
            ((freq - freq[nchan // 2]) / freq[nchan // 2])[:, None] ** np.arange(3)[None, :]
        )
        coeffs = rng.normal(size=(3, 1, n, n))
        cube = np.einsum("cm,mpyx->cpyx", w, coeffs)
        im = im.replace(pixels=jnp.asarray(cube))
        taylor = calculate_frequency_taylor_terms_from_image(im, nmoment=3)
        back = calculate_image_from_frequency_taylor_terms(im, taylor)
        np.testing.assert_allclose(
            np.asarray(back.pixels), cube, atol=1e-10
        )

    def test_moments_shape(self, rng):
        n, nchan = 16, 6
        freq = 1e8 + 1e6 * np.arange(nchan)
        im = create_image(n, 0.001, PC, frequency=freq)
        im = im.replace(
            pixels=jnp.asarray(rng.normal(size=(nchan, 1, n, n)))
        )
        mom = calculate_image_frequency_moments(im, nmoment=2)
        assert mom.pixels.shape == (2, 1, n, n)
