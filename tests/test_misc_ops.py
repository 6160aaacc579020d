"""Coverage sweep over the remaining operations: visibility algebra,
image conversions, component utilities, gaintable algebra, QA."""

import numpy as np
import jax.numpy as jnp
import pytest

from ska_sdp_func_python_tpu.models import (
    SkyComponents,
    create_gaintable_from_visibility,
    create_image,
)
from ska_sdp_func_python_tpu.ops import (
    apply_gaintable,
    apply_voltage_pattern_to_skycomponent,
    calculate_visibility_phasor,
    concatenate_gaintables,
    concatenate_visibility,
    convert_polimage_to_stokes,
    convert_stokes_to_polimage,
    convert_visibility_to_stokes,
    dft_skycomponent_visibility,
    expand_polarizations,
    extract_oversampled,
    fit_skycomponent,
    fit_skycomponent_spectral_index,
    idft_visibility_skycomponent,
    image_voronoi_iter,
    integrate_visibility_by_channel,
    average_visibility_by_channel,
    multiply_gaintables,
    phaserotate_visibility,
    remove_continuum_visibility,
    restore_skycomponent,
    taper_visibility_tukey,
)
from ska_sdp_func_python_tpu.utils import (
    average_chunks2,
    qa_gain_table,
    qa_image,
    qa_visibility,
)
from ska_sdp_func_python_tpu.utils.coordinates import simulate_point

import reference_oracle
from simul import make_visibility
from test_solvers import _simulate_gaintable

PC = (0.0, np.deg2rad(-35.0))


class TestVisibilityAlgebra:
    def test_remove_continuum(self, rng):
        vis = make_visibility(nants=5, ntimes=1, nchan=8)
        # linear spectrum + small line signal
        x = np.linspace(-1, 1, 8)
        spec = 2.0 + 1.5 * x
        visdata = np.broadcast_to(
            spec[None, None, :, None], vis.vis.shape
        ).astype(complex)
        out = remove_continuum_visibility(
            vis.replace(vis=jnp.asarray(visdata)), degree=1
        )
        assert float(jnp.max(jnp.abs(out.vis))) < 1e-8

    def test_integrate_and_average_channels(self, rng):
        vis = make_visibility(nants=5, ntimes=2, nchan=6)
        data = rng.normal(size=vis.vis.shape) + 0j
        vis = vis.replace(vis=jnp.asarray(data))
        integrated = integrate_visibility_by_channel(vis)
        assert integrated.nchan == 1
        np.testing.assert_allclose(
            np.asarray(integrated.vis[..., 0, :]),
            data.mean(axis=2),
            atol=1e-10,
        )
        groups = average_visibility_by_channel(vis, 2)
        assert len(groups) == 3
        np.testing.assert_allclose(
            np.asarray(groups[0].vis[..., 0, :]),
            data[:, :, 0:2].mean(axis=2),
            atol=1e-10,
        )

    def test_expand_polarizations(self, rng):
        d2 = rng.normal(size=(3, 4, 2))
        out = expand_polarizations(d2)
        assert out.shape == (3, 4, 4)
        np.testing.assert_allclose(np.asarray(out[..., 3]), d2[..., 1])
        np.testing.assert_allclose(np.asarray(out[..., 1]), 0.0)

    def test_phaserotate_non_tangent_roundtrip(self, rng):
        vis = make_visibility(nants=6, ntimes=2, nchan=1)
        data = rng.normal(size=vis.vis.shape) + 1j * rng.normal(
            size=vis.vis.shape
        )
        vis = vis.replace(vis=jnp.asarray(data))
        new_pc = (0.01, np.deg2rad(-34.5))
        rot = phaserotate_visibility(vis, new_pc, tangent=False)
        assert float(jnp.abs(rot.phasecentre[0] - new_pc[0])) < 1e-12
        back = phaserotate_visibility(
            rot, PC, tangent=False
        )
        np.testing.assert_allclose(
            np.asarray(back.vis), data, atol=1e-8
        )

    def test_phasor_matches_simulate_point(self, rng):
        vis = make_visibility(nants=5, ntimes=1, nchan=1)
        direction = np.array([0.004, np.deg2rad(-34.8)])
        phasor = calculate_visibility_phasor(direction, vis)
        from ska_sdp_func_python_tpu.utils.coordinates import radec_to_lmn

        l, m, _ = radec_to_lmn(
            direction[0], direction[1], PC[0], PC[1]
        )
        expected = simulate_point(
            vis.uvw_lambda[0, :, 0, :], float(l), float(m)
        )
        np.testing.assert_allclose(
            np.asarray(phasor)[0, :, 0], np.asarray(expected), atol=1e-10
        )

    def test_concatenate_time(self, rng):
        v1 = make_visibility(nants=4, ntimes=2, nchan=1)
        v2 = make_visibility(nants=4, ntimes=3, nchan=1)
        out = concatenate_visibility([v1, v2], "time")
        assert out.ntimes == 5

    def test_tukey_taper(self, rng):
        vis = make_visibility(nants=6, ntimes=1, nchan=1)
        out = taper_visibility_tukey(vis, tukey=0.5)
        imwt = np.asarray(out.imaging_weight)
        assert imwt.max() <= 1.0 + 1e-12
        assert imwt.min() >= 0.0

    def test_convert_to_stokes(self, rng):
        vis = make_visibility(
            nants=4, ntimes=1, nchan=1, polarisation_frame="linear"
        )
        data = rng.normal(size=vis.vis.shape) + 1j * rng.normal(
            size=vis.vis.shape
        )
        vis = vis.replace(vis=jnp.asarray(data))
        out = convert_visibility_to_stokes(vis)
        assert out.polarisation_frame == "stokesIQUV"
        np.testing.assert_allclose(
            np.asarray(out.vis[..., 0]),
            0.5 * (data[..., 0] + data[..., 3]),
            atol=1e-12,
        )


class TestComponentExtras:
    def test_idft_recovers_flux(self, rng):
        vis = make_visibility(nants=8, ntimes=2, nchan=2)
        comps = SkyComponents.from_lists(
            [[0.003, np.deg2rad(-34.9)]],
            np.full((1, 2, 1), 1.7),
            vis.frequency,
        )
        vis = dft_skycomponent_visibility(vis, comps)
        rec, weights = idft_visibility_skycomponent(vis, comps)
        np.testing.assert_allclose(
            np.asarray(rec.flux), 1.7, atol=1e-8
        )
        assert np.all(np.asarray(weights) > 0)

    def test_restore_skycomponent_peak(self, rng):
        model = create_image(64, 0.001, PC)
        ra, dec = model.pixel_to_radec(40, 25)
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]], np.full((1, 1, 1), 2.0),
            model.frequency,
        )
        beam = {"bmaj": np.rad2deg(0.003), "bmin": np.rad2deg(0.003), "bpa": 0.0}
        out = restore_skycomponent(model, comps, beam)
        img = np.asarray(out.pixels)[0, 0]
        iy, ix = np.unravel_index(np.argmax(img), img.shape)
        assert (ix, iy) == (40, 25)
        np.testing.assert_allclose(img[iy, ix], 2.0, rtol=1e-6)

    def test_fit_skycomponent(self, rng):
        model = create_image(64, 0.001, PC)
        iy0, ix0 = 30, 38
        yy, xx = np.mgrid[0:64, 0:64]
        blob = 3.0 * np.exp(
            -((xx - ix0) ** 2 + (yy - iy0) ** 2) / (2 * 2.0**2)
        )
        model = model.replace(pixels=jnp.asarray(blob)[None, None])
        ra, dec = model.pixel_to_radec(ix0 + 0.8, iy0 - 0.6)
        fit = fit_skycomponent(model, np.array([float(ra), float(dec)]))
        fx, fy = model.radec_to_pixel(
            fit.direction[0, 0], fit.direction[0, 1]
        )
        assert abs(float(fx) - ix0) < 0.05
        assert abs(float(fy) - iy0) < 0.05
        np.testing.assert_allclose(float(fit.flux[0, 0, 0]), 3.0, rtol=1e-3)

    def test_spectral_index(self, rng):
        freq = 1e8 * (1 + 0.1 * np.arange(4))
        flux = (freq / freq[0]) ** (-0.7)
        comps = SkyComponents.from_lists(
            [[0.0, -0.6]], flux[None, :, None], freq
        )
        alpha = fit_skycomponent_spectral_index(comps)
        np.testing.assert_allclose(alpha[0], -0.7, atol=1e-6)

    def test_voltage_pattern(self, rng):
        model = create_image(32, 0.001, PC, polarisation_frame="stokesIQUV")
        # identity Jones voltage pattern -> flux unchanged
        vp_pixels = jnp.zeros((1, 4, 32, 32), dtype=jnp.complex128)
        vp_pixels = vp_pixels.at[:, 0].set(1.0).at[:, 3].set(1.0)
        vp = model.replace(pixels=vp_pixels)
        comps = SkyComponents.from_lists(
            [[0.0, np.deg2rad(-35.0)]],
            np.array([[[1.0, 0.2, 0.1, 0.8]]]),
            model.frequency,
            polarisation_frame="stokesIQUV",
        )
        out = apply_voltage_pattern_to_skycomponent(comps, vp)
        np.testing.assert_allclose(
            np.asarray(out.flux), np.asarray(comps.flux), atol=1e-12
        )

    def test_voronoi_iter_partitions(self, rng):
        model = create_image(32, 0.001, PC)
        model = model.replace(
            pixels=jnp.ones_like(model.pixels)
        )
        dirs = [model.pixel_to_radec(8, 8), model.pixel_to_radec(24, 24)]
        comps = SkyComponents.from_lists(
            [[float(a), float(b)] for a, b in dirs],
            np.ones((2, 1, 1)),
            model.frequency,
        )
        pieces = list(image_voronoi_iter(model, comps))
        assert len(pieces) == 2
        total = sum(float(jnp.sum(p.pixels)) for p in pieces)
        np.testing.assert_allclose(total, 32 * 32, rtol=1e-12)


class TestImageConversions:
    def test_stokes_polimage_roundtrip(self, rng):
        im = create_image(16, 0.001, PC, polarisation_frame="stokesIQUV")
        im = im.replace(
            pixels=jnp.asarray(rng.normal(size=(1, 4, 16, 16)))
        )
        pol = convert_stokes_to_polimage(im, "linear")
        assert pol.polarisation_frame == "linear"
        back = convert_polimage_to_stokes(pol)
        assert back.polarisation_frame == "stokesIQUV"
        np.testing.assert_allclose(
            np.asarray(back.pixels), np.asarray(im.pixels), atol=1e-12
        )


class TestGaintableAlgebra:
    def test_multiply_and_concatenate(self, rng):
        vis = make_visibility(nants=5, ntimes=2, nchan=1)
        gt1 = create_gaintable_from_visibility(vis, jones_type="T")
        gt1 = _simulate_gaintable(gt1, rng, 0.1)
        gt2 = create_gaintable_from_visibility(vis, jones_type="T")
        gt2 = _simulate_gaintable(gt2, rng, 0.1)
        prod = multiply_gaintables(gt1, gt2)
        assert prod.gain.shape == gt1.gain.shape
        cat = concatenate_gaintables([gt1, gt2])
        assert cat.ntimes == gt1.ntimes + gt2.ntimes

    def test_apply_sequence_equals_product(self, rng):
        """Applying gt1 then gt2 == applying the Jones product."""
        vis = make_visibility(nants=5, ntimes=1, nchan=1)
        data = rng.normal(size=vis.vis.shape) + 1j * rng.normal(
            size=vis.vis.shape
        )
        vis = vis.replace(vis=jnp.asarray(data))
        gt1 = _simulate_gaintable(
            create_gaintable_from_visibility(vis, jones_type="T"), rng, 0.1
        )
        gt2 = _simulate_gaintable(
            create_gaintable_from_visibility(vis, jones_type="T"), rng, 0.1
        )
        seq = apply_gaintable(apply_gaintable(vis, gt2), gt1)
        prod = multiply_gaintables(gt1, gt2)
        once = apply_gaintable(vis, prod)
        np.testing.assert_allclose(
            np.asarray(seq.vis), np.asarray(once.vis), atol=1e-10
        )


class TestUtilsExtras:
    def test_average_chunks2(self, rng):
        arr = rng.normal(size=(6, 9))
        wts = np.ones_like(arr)
        avg, w = average_chunks2(arr, wts, (2, 3))
        assert avg.shape == (3, 3)
        np.testing.assert_allclose(
            float(avg[0, 0]), arr[0:2, 0:3].mean(), atol=1e-12
        )

    def test_extract_oversampled_golden(self, rng):
        ref = reference_oracle.load_fft_support()
        a = rng.normal(size=(64, 64))
        got = extract_oversampled(jnp.asarray(a), 2, 3, 4, 8)
        expected = ref.extract_oversampled(a, 2, 3, 4, 8)
        np.testing.assert_allclose(np.asarray(got), expected)

    def test_qa_functions(self, rng):
        vis = make_visibility(nants=4, ntimes=1, nchan=1)
        im = create_image(16, 0.001, PC)
        gt = create_gaintable_from_visibility(vis)
        for qa in (
            qa_visibility(vis, "ctx"),
            qa_image(im, "ctx"),
            qa_gain_table(gt, "ctx"),
        ):
            assert qa["context"] == "ctx"
            assert "shape" in qa
