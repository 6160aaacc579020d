"""M0 foundation tests: coordinates, FFT helpers, PSWF (golden vs reference),
polarisation conversions, DFT predict/invert round trips."""

import numpy as np
import jax.numpy as jnp
import pytest

from ska_sdp_func_python_tpu.utils.coordinates import (
    azel_to_hadec,
    hadec_to_azel,
    lmn_to_radec,
    radec_to_lmn,
    simulate_point,
    uvw_to_xyz,
    xyz_to_uvw,
)
from ska_sdp_func_python_tpu.utils.arrays import (
    average_chunks,
    tukey_filter,
)
from ska_sdp_func_python_tpu.ops.fft import (
    extract_mid,
    fft,
    ifft,
    pad_mid,
)
from ska_sdp_func_python_tpu.ops.pswf import coordinates, grdsf, w_beam
from ska_sdp_func_python_tpu.models.polarisation import (
    convert_circular_to_stokes,
    convert_linear_to_stokes,
    convert_pol_frame,
    convert_stokes_to_circular,
    convert_stokes_to_linear,
)

import reference_oracle


class TestCoordinates:
    def test_xyz_uvw_roundtrip(self, rng):
        xyz = rng.normal(size=(10, 3))
        ha, dec = 0.3, -0.6
        uvw = xyz_to_uvw(xyz, ha, dec)
        back = uvw_to_xyz(uvw, ha, dec)
        np.testing.assert_allclose(np.asarray(back), xyz, atol=1e-12)

    def test_lmn_radec_roundtrip(self):
        ra0, dec0 = 0.1, -0.5
        ra, dec = 0.13, -0.47
        l, m, n1 = radec_to_lmn(ra, dec, ra0, dec0)
        ra2, dec2 = lmn_to_radec(l, m, ra0, dec0)
        np.testing.assert_allclose([float(ra2), float(dec2)], [ra, dec], atol=1e-12)

    def test_lmn_at_centre(self):
        l, m, n1 = radec_to_lmn(0.2, -0.4, 0.2, -0.4)
        np.testing.assert_allclose(
            [float(l), float(m), float(n1)], [0, 0, 0], atol=1e-15
        )

    def test_lmn_small_offset_matches_tangent(self):
        # 1 arcmin east offset: l ~ dra*cos(dec)
        ra0, dec0 = 1.0, -0.6
        dra = np.deg2rad(1 / 60)
        l, m, _ = radec_to_lmn(ra0 + dra, dec0, ra0, dec0)
        np.testing.assert_allclose(float(l), dra * np.cos(dec0), rtol=1e-4)
        assert abs(float(m)) < 1e-7

    def test_hadec_azel_roundtrip(self):
        lat = -0.45
        ha, dec = 0.2, -0.7
        az, el = hadec_to_azel(ha, dec, lat)
        ha2, dec2 = azel_to_hadec(az, el, lat)
        np.testing.assert_allclose(
            [float(ha2), float(dec2)], [ha, dec], atol=1e-12
        )

    def test_simulate_point_phase_centre(self, rng):
        uvw = rng.normal(size=(5, 4, 3))
        vis = simulate_point(uvw, 0.0, 0.0)
        np.testing.assert_allclose(np.asarray(vis), 1.0 + 0j, atol=1e-14)


class TestArrays:
    def test_average_chunks(self, rng):
        arr = rng.normal(size=11)
        wts = rng.uniform(0.5, 1.0, size=11)
        avg, w = average_chunks(arr, wts, 3)
        assert avg.shape == (4,)
        expect0 = np.sum(arr[:3] * wts[:3]) / np.sum(wts[:3])
        np.testing.assert_allclose(float(avg[0]), expect0, rtol=1e-12)

    def test_tukey(self):
        x = jnp.linspace(0, 1, 101)
        f = tukey_filter(x, 0.5)
        assert float(f[50]) == 1.0
        np.testing.assert_allclose(float(f[0]), 0.0, atol=1e-12)


class TestFFT:
    def test_roundtrip(self, rng):
        a = rng.normal(size=(2, 1, 32, 32)) + 1j * rng.normal(size=(2, 1, 32, 32))
        np.testing.assert_allclose(np.asarray(ifft(fft(a))), a, atol=1e-12)

    def test_matches_reference_convention(self, rng):
        ref = reference_oracle.load_fft_support()
        a = rng.normal(size=(1, 1, 16, 16)) + 1j * rng.normal(size=(1, 1, 16, 16))
        np.testing.assert_allclose(
            np.asarray(fft(a)), ref.fft(a), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(ifft(a)), ref.ifft(a), atol=1e-10
        )

    def test_pad_extract(self, rng):
        a = rng.normal(size=(1, 1, 16, 16))
        p = pad_mid(a, 32)
        assert p.shape == (1, 1, 32, 32)
        back = extract_mid(p, 16)
        np.testing.assert_allclose(np.asarray(back), a)
        ref = reference_oracle.load_fft_support()
        np.testing.assert_allclose(np.asarray(p), ref.pad_mid(a, 32))


class TestPSWF:
    def test_grdsf_golden(self):
        ref = reference_oracle.load_fft_coordinates()
        nu = np.linspace(0.0, 1.0, 57)
        g_ref, c_ref = ref.grdsf(nu)
        g, c = grdsf(jnp.asarray(nu))
        np.testing.assert_allclose(np.asarray(g), g_ref, atol=1e-12)
        np.testing.assert_allclose(np.asarray(c), c_ref, atol=1e-12)

    def test_coordinates_golden(self):
        ref = reference_oracle.load_fft_coordinates()
        np.testing.assert_allclose(
            np.asarray(coordinates(33)), ref.coordinates(33)
        )

    @pytest.mark.parametrize("npixel", [64, 65])
    def test_w_beam_golden(self, npixel):
        ref = reference_oracle.load_fft_coordinates()
        wb_ref = ref.w_beam(npixel, 0.02, 100.0)
        wb = w_beam(npixel, 0.02, 100.0)
        assert wb.shape == wb_ref.shape
        np.testing.assert_allclose(np.asarray(wb), wb_ref, atol=1e-10)


class TestPolarisation:
    def test_linear_roundtrip(self, rng):
        data = rng.normal(size=(3, 4)) + 1j * rng.normal(size=(3, 4))
        back = convert_linear_to_stokes(convert_stokes_to_linear(data))
        np.testing.assert_allclose(np.asarray(back), data, atol=1e-12)

    def test_circular_roundtrip(self, rng):
        data = rng.normal(size=(3, 4)) + 1j * rng.normal(size=(3, 4))
        back = convert_circular_to_stokes(convert_stokes_to_circular(data))
        np.testing.assert_allclose(np.asarray(back), data, atol=1e-12)

    def test_known_values(self):
        # pure I -> linear: XX=YY=I, XY=YX=0
        iquv = jnp.asarray([[1.0 + 0j, 0, 0, 0]])
        lin = convert_stokes_to_linear(iquv)
        np.testing.assert_allclose(
            np.asarray(lin)[0], [1, 0, 0, 1], atol=1e-14
        )
        # circular: RR=LL=I
        circ = convert_stokes_to_circular(iquv)
        np.testing.assert_allclose(
            np.asarray(circ)[0], [1, 0, 0, 1], atol=1e-14
        )

    def test_pol_frame_linear_to_circular(self, rng):
        data = rng.normal(size=(5, 4)) + 1j * rng.normal(size=(5, 4))
        via = convert_pol_frame(
            convert_pol_frame(data, "linear", "stokesIQUV"),
            "stokesIQUV",
            "circular",
        )
        direct = convert_pol_frame(data, "linear", "circular")
        np.testing.assert_allclose(np.asarray(via), np.asarray(direct), atol=1e-12)


class TestFracDotTurns:
    """config.frac_dot_turns: split-compensated mod-1 phase reduction."""

    def test_f32_accuracy_at_large_phase(self):
        from ska_sdp_func_python_tpu.config import frac_dot_turns

        rng = np.random.default_rng(0)
        u32 = rng.uniform(-1e5, 1e5, (512, 3)).astype(np.float32)
        l32 = rng.uniform(-0.1, 0.1, (512, 3)).astype(np.float32)
        truth = np.einsum(
            "ks,ks->k", u32.astype(np.float64), l32.astype(np.float64)
        )
        got = np.asarray(
            frac_dot_turns(
                jnp.asarray(u32, jnp.float32), jnp.asarray(l32, jnp.float32)
            )
        ).astype(np.float64)
        # compare on the unit circle (mod-1 equivalence)
        err = np.abs(
            np.exp(2j * np.pi * truth) - np.exp(2j * np.pi * got)
        )
        assert err.max() < 5e-6
        # plain f32 evaluation is orders of magnitude worse at this scale
        plain = np.einsum("ks,ks->k", u32, l32).astype(np.float64)
        errp = np.abs(
            np.exp(2j * np.pi * truth) - np.exp(2j * np.pi * plain)
        )
        assert errp.max() > 50 * err.max()

    def test_f64_matches_plain(self):
        from ska_sdp_func_python_tpu.config import frac_dot_turns

        rng = np.random.default_rng(1)
        a = rng.uniform(-1e4, 1e4, (64, 3))
        b = rng.uniform(-0.5, 0.5, (64, 3))
        d = np.einsum("ks,ks->k", a, b)
        got = np.asarray(frac_dot_turns(jnp.asarray(a), jnp.asarray(b)))
        err = np.abs(
            np.exp(2j * np.pi * d) - np.exp(2j * np.pi * got)
        )
        assert err.max() < 1e-10
