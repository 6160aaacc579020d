"""M7 periphery tests: beamformer utils, parset gaincal engine, GridData API
+ AW-projection, visibility geometry."""

import numpy as np
import jax.numpy as jnp
import pytest

from ska_sdp_func_python_tpu.models import (
    GainTable,
    SkyComponents,
    create_gaintable_from_visibility,
)
from ska_sdp_func_python_tpu.ops import (
    apply_gaintable,
    calculate_visibility_azel,
    calculate_visibility_hourangles,
    create_awterm_convolutionfunction,
    create_griddata_from_image,
    create_image_from_visibility,
    create_parset_from_context,
    create_pswf_convolutionfunction,
    degrid_visibility_from_griddata,
    dft_skycomponent_visibility,
    expand_delay_phase,
    fft_griddata_to_image,
    gaincal,
    grid_visibility_to_griddata,
    grid_visibility_weight_to_griddata,
    griddata_visibility_reweight,
    invert_awprojection,
    multiply_gaintable_jones,
    predict_awprojection,
    resample_bandpass,
    set_beamformer_frequencies,
    weight_visibility,
)
from ska_sdp_func_python_tpu.ops.imaging import normalise_sumwt

from simul import make_visibility
from test_solvers import _simulate_gaintable

PC = (0.0, np.deg2rad(-35.0))


def _bandpass_table(rng, nants=4, nchan=16):
    vis = make_visibility(nants=nants, ntimes=1, nchan=nchan)
    gt = create_gaintable_from_visibility(vis, jones_type="B")
    gain = np.asarray(gt.gain)
    freqs = np.asarray(gt.frequency)
    # smooth spectral shape
    x = (freqs - freqs.mean()) / (freqs.max() - freqs.min())
    spec = 1.0 + 0.3 * x + 0.2 * x**2 + 1j * (0.1 * x - 0.05 * x**2)
    gain = gain * spec[None, None, :, None, None]
    return gt.replace(gain=jnp.asarray(gain))


class TestBeamformer:
    def test_set_frequencies_low(self, rng):
        gt = _bandpass_table(rng)
        freqs = set_beamformer_frequencies(gt, array="LOW")
        df = np.diff(freqs)
        np.testing.assert_allclose(df, 781.25e3)
        assert np.allclose(freqs % 781.25e3, 0.0)

    def test_expand_delay_phase(self, rng):
        vis = make_visibility(nants=4, ntimes=1, nchan=1)
        gt = create_gaintable_from_visibility(vis, jones_type="T")
        gt = gt.replace(jones_type="K")
        phase0 = 0.3
        gain = jnp.asarray(np.asarray(gt.gain) * np.exp(1j * phase0))
        gt = gt.replace(gain=gain)
        f0 = float(gt.frequency[0])
        freqs = np.array([f0, 2 * f0])
        out = expand_delay_phase(gt, freqs, reference_to_centre=False)
        assert out.jones_type == "B"
        np.testing.assert_allclose(
            np.angle(np.asarray(out.gain)[0, 0, 0, 0, 0]), phase0, atol=1e-10
        )
        np.testing.assert_allclose(
            np.angle(np.asarray(out.gain)[0, 0, 1, 0, 0]),
            2 * phase0,
            atol=1e-10,
        )

    def test_multiply_jones(self, rng):
        gt1 = _bandpass_table(rng)
        gt2 = _bandpass_table(rng)
        out = multiply_gaintable_jones(gt1, gt2)
        expected = np.einsum(
            "...ij,...jk->...ik", np.asarray(gt1.gain), np.asarray(gt2.gain)
        )
        np.testing.assert_allclose(np.asarray(out.gain), expected, atol=1e-12)

    @pytest.mark.parametrize("alg", ["polyfit", "interp", "cubicspl"])
    def test_resample_bandpass_recovers_smooth(self, rng, alg):
        gt = _bandpass_table(rng)
        freqs_out = set_beamformer_frequencies(gt, array="LOW")
        out = resample_bandpass(freqs_out, gt, alg=alg)
        assert out.nchan == len(freqs_out)
        # smooth quadratic spectrum should be recovered accurately
        f = np.asarray(gt.frequency)
        x = (freqs_out - f.mean()) / (f.max() - f.min())
        expected = 1.0 + 0.3 * x + 0.2 * x**2 + 1j * (0.1 * x - 0.05 * x**2)
        got = np.asarray(out.gain)[0, 0, :, 0, 0]
        interior = (freqs_out > f[1]) & (freqs_out < f[-2])
        np.testing.assert_allclose(
            got[interior], expected[interior], atol=5e-3
        )


class TestGaincalEngine:
    def test_parset_contents(self, rng):
        vis = make_visibility(nants=6, ntimes=2, nchan=1)
        parsets = create_parset_from_context(vis, "TG")
        assert len(parsets) == 2
        assert parsets[0].get("gaincal.caltype") == "scalarphase"
        assert parsets[1].get("gaincal.caltype") == "diagonal"

    def test_gaincal_corrects(self, rng):
        vis = make_visibility(nants=8, ntimes=2, nchan=1)
        comps = SkyComponents.from_lists(
            [[0.0, np.deg2rad(-35.0)]], [[[1.0]]], vis.frequency
        )
        vis = dft_skycomponent_visibility(vis, comps)
        gt = create_gaintable_from_visibility(vis, jones_type="T")
        gt = _simulate_gaintable(gt, rng, phase_error=0.2)
        corrupted = apply_gaintable(vis, gt)
        corrected = gaincal(corrupted, vis, calibration_context="T")
        np.testing.assert_allclose(
            np.asarray(corrected.vis), np.asarray(vis.vis), atol=1e-5
        )


class TestGridDataAPI:
    def test_awprojection_predict_matches_dft_zero_w(self, rng):
        vis = make_visibility(nants=8, ntimes=2, nchan=1, rmax=200.0)
        vis = vis.replace(uvw=vis.uvw.at[..., 2].set(0.0))
        model = create_image_from_visibility(
            vis, npixel=256, oversampling=6.0, nchan=1
        )
        ra, dec = model.pixel_to_radec(128 + 10, 128 - 6)
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]], [[[1.0]]], vis.frequency
        )
        vis_dft = dft_skycomponent_visibility(vis, comps)
        pixels = jnp.zeros_like(model.pixels).at[0, 0, 128 - 6, 128 + 10].set(
            1.0
        )
        from ska_sdp_func_python_tpu.ops.gridding import grid_correction

        gcf = 1.0 / grid_correction(256, 8)
        # use the default PSWF CF path; oversampled kernel => ~1e-2 accuracy
        vis_aw = predict_awprojection(
            vis, model.with_pixels(pixels), gcfcf=None
        )
        err = np.max(
            np.abs(np.asarray(vis_aw.vis) - np.asarray(vis_dft.vis))
        )
        assert err < 0.05, err

    def test_grid_invert_peak(self, rng):
        vis = make_visibility(nants=8, ntimes=2, nchan=1, rmax=200.0)
        vis = vis.replace(uvw=vis.uvw.at[..., 2].set(0.0))
        model = create_image_from_visibility(
            vis, npixel=256, oversampling=6.0, nchan=1
        )
        comps = SkyComponents.from_lists(
            [[0.0, np.deg2rad(-35.0)]], [[[1.0]]], vis.frequency
        )
        vis = dft_skycomponent_visibility(vis, comps)
        dirty, sumwt = invert_awprojection(vis, model)
        img = np.asarray(dirty.pixels)[0, 0]
        iy, ix = np.unravel_index(np.argmax(img), img.shape)
        assert (ix, iy) == (128, 128)
        assert abs(img[iy, ix] - 1.0) < 0.05

    def test_weight_griddata_roundtrip(self, rng):
        vis = make_visibility(nants=8, ntimes=2, nchan=1)
        model = create_image_from_visibility(vis, npixel=128, nchan=1)
        gd = create_griddata_from_image(model)
        gd, sumwt = grid_visibility_weight_to_griddata(vis, gd)
        assert float(sumwt[0, 0]) > 0
        wvis = griddata_visibility_reweight(vis, gd, weighting="uniform")
        # must agree with the weighting-module path
        wref = weight_visibility(vis, model, weighting="uniform")
        np.testing.assert_allclose(
            np.asarray(wvis.imaging_weight),
            np.asarray(wref.imaging_weight),
            atol=1e-12,
        )


class TestVisibilityGeometry:
    def test_hourangles_and_azel(self, rng):
        vis = make_visibility(nants=4, ntimes=3, nchan=1)
        location = (np.deg2rad(-26.82), np.deg2rad(116.76), 300.0)
        ha = calculate_visibility_hourangles(vis, location)
        assert ha.shape == (3,)
        az, el = calculate_visibility_azel(vis, location)
        assert az.shape == (3,)
        assert np.all(np.abs(np.asarray(el)) <= np.pi / 2)
