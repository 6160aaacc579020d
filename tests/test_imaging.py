"""M3 imaging tests: gridded predict vs direct DFT, invert peak recovery,
PSF normalisation, weighting — mirroring the reference's physics-invariant
strategy (tests/imaging/test_imaging_ng.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ska_sdp_func_python_tpu.models import SkyComponents, create_image
from ska_sdp_func_python_tpu.ops.dft import dft_skycomponent_visibility
from ska_sdp_func_python_tpu.ops.imaging import (
    advise_wide_field,
    create_image_from_visibility,
    invert_visibility,
    predict_visibility,
)
from ska_sdp_func_python_tpu.ops.weighting import (
    taper_visibility_gaussian,
    weight_visibility,
)
from ska_sdp_func_python_tpu.utils.arrays import insert_array

from simul import make_visibility


NPIX = 256
PC = (0.0, np.deg2rad(-35.0))


def _vis_and_image(nchan=1, rmax=300.0, nants=10, ntimes=3):
    vis = make_visibility(
        nants=nants, ntimes=ntimes, nchan=nchan, rmax=rmax, phasecentre=PC
    )
    model = create_image_from_visibility(
        vis, npixel=NPIX, oversampling=4.0, nchan=1
    )
    return vis, model


def _point_comps(model, offsets_pix, flux=1.0, nchan=1):
    """Components at exact pixel positions (so gridded/DFT agree exactly)."""
    dirs = []
    for (dx, dy) in offsets_pix:
        ra, dec = model.pixel_to_radec(
            NPIX // 2 + dx, NPIX // 2 + dy
        )
        dirs.append([float(ra), float(dec)])
    return SkyComponents.from_lists(
        dirs,
        np.full((len(dirs), nchan, 1), flux),
        model.frequency,
    )


class TestPredictInvert:
    def test_predict_2d_matches_dft_zero_w(self):
        """With w artificially zeroed, gridded predict == DFT to ~1e-5."""
        vis, model = _vis_and_image()
        vis = vis.replace(uvw=vis.uvw.at[..., 2].set(0.0))
        comps = _point_comps(model, [(20, -32)])
        vis_dft = dft_skycomponent_visibility(vis, comps)
        # paint the component onto the model image at its exact pixel
        ix, iy = model.lm_to_pixel(
            *[x for x in model.pixel_to_lm(NPIX // 2 + 20, NPIX // 2 - 32)]
        )
        pixels = jnp.zeros_like(model.pixels)
        pixels = pixels.at[0, 0, NPIX // 2 - 32, NPIX // 2 + 20].set(1.0)
        model_img = model.with_pixels(pixels)
        vis_grid = predict_visibility(vis, model_img, context="2d")
        err = np.max(
            np.abs(np.asarray(vis_grid.vis) - np.asarray(vis_dft.vis))
        )
        assert err < 1e-6, f"predict vs DFT error {err}"

    def test_predict_wstack_matches_dft(self):
        """Full w-term predict vs DFT."""
        vis, model = _vis_and_image()
        comps = _point_comps(model, [(12, 9)])
        vis_dft = dft_skycomponent_visibility(vis, comps)
        pixels = jnp.zeros_like(model.pixels)
        pixels = pixels.at[0, 0, NPIX // 2 + 9, NPIX // 2 + 12].set(1.0)
        model_img = model.with_pixels(pixels)
        vis_grid = predict_visibility(vis, model_img, context="ng", nw=32)
        err = np.max(
            np.abs(np.asarray(vis_grid.vis) - np.asarray(vis_dft.vis))
        )
        assert err < 1e-3, f"w-stack predict vs DFT error {err}"

    def test_invert_peak_position_and_flux(self):
        vis, model = _vis_and_image()
        comps = _point_comps(model, [(-18, 25)], flux=2.0)
        vis = dft_skycomponent_visibility(vis, comps)
        dirty, sumwt = invert_visibility(vis, model, context="ng", nw=32)
        img = np.asarray(dirty.pixels)[0, 0]
        iy, ix = np.unravel_index(np.argmax(img), img.shape)
        assert (ix, iy) == (NPIX // 2 - 18, NPIX // 2 + 25)
        assert abs(img[iy, ix] - 2.0) < 0.02, img[iy, ix]

    def test_psf_peak_is_unity(self):
        vis, model = _vis_and_image()
        psf, sumwt = invert_visibility(
            vis, model, dopsf=True, context="2d"
        )
        img = np.asarray(psf.pixels)[0, 0]
        iy, ix = np.unravel_index(np.argmax(img), img.shape)
        assert (ix, iy) == (NPIX // 2, NPIX // 2)
        np.testing.assert_allclose(img[iy, ix], 1.0, atol=1e-6)

    def test_predict_invert_roundtrip_centre_flux(self):
        """Reference-style self-consistency (test_imaging_ng.py:60-77)."""
        vis, model = _vis_and_image()
        comps = _point_comps(model, [(0, 0)], flux=1.0)
        vis = dft_skycomponent_visibility(vis, comps)
        dirty, _ = invert_visibility(vis, model, context="ng")
        peak = float(np.max(np.asarray(dirty.pixels)))
        assert abs(peak - 1.0) < 1e-2, peak

    def test_mfs_multichannel(self):
        vis, model = _vis_and_image(nchan=3)
        comps = _point_comps(model, [(5, -7)], nchan=3)
        # broadcast component frequency to vis channels
        comps = comps.replace(
            frequency=vis.frequency,
        )
        vis = dft_skycomponent_visibility(vis, comps)
        dirty, sumwt = invert_visibility(vis, model, context="ng")
        assert sumwt.shape == (1, 1)
        img = np.asarray(dirty.pixels)[0, 0]
        iy, ix = np.unravel_index(np.argmax(img), img.shape)
        assert (ix, iy) == (NPIX // 2 + 5, NPIX // 2 - 7)
        assert abs(img[iy, ix] - 1.0) < 0.02


class TestWeighting:
    def test_uniform_weighting_flattens_density(self):
        vis, model = _vis_and_image()
        wvis = weight_visibility(vis, model, weighting="uniform")
        imwt = np.asarray(wvis.flagged_imaging_weight)
        assert imwt.min() >= 0
        assert imwt.sum() > 0
        # uniform weights should vary less than natural in dense regions
        assert imwt.max() <= np.asarray(vis.weight).max() + 1e-12

    def test_robust_weighting_range(self):
        vis, model = _vis_and_image()
        wv_r = weight_visibility(
            vis, model, weighting="robust", robustness=0.0
        )
        assert float(jnp.sum(wv_r.imaging_weight)) > 0

    def test_gaussian_taper_reduces_long_baselines(self):
        vis, model = _vis_and_image()
        tv = taper_visibility_gaussian(vis, beam=0.01)
        imwt = np.asarray(tv.imaging_weight)
        uvd = np.asarray(
            jnp.sqrt(
                vis.uvw_lambda[..., 0] ** 2 + vis.uvw_lambda[..., 1] ** 2
            )
        )
        long_b = uvd > np.percentile(uvd, 90)
        short_b = uvd < np.percentile(uvd, 10)
        assert imwt[long_b].mean() < imwt[short_b].mean()


class TestAdvise:
    def test_advise_keys(self):
        vis, _ = _vis_and_image()
        advice = advise_wide_field(vis)
        for key in (
            "cellsize",
            "npixels2",
            "wstep",
            "vis_slices",
            "image_fov",
        ):
            assert key in advice
        assert advice["cellsize"] > 0
        assert advice["npixels2"] >= 2


class TestWInterpAccuracy:
    def test_nearest_doubled_planes_matches_linear(self):
        """nearest-w with 2x planes has comparable predict accuracy to
        linear-w (the basis of the fast bench configuration)."""
        from ska_sdp_func_python_tpu.ops.imaging import predict_core

        vis, model = _vis_and_image()
        comps = _point_comps(model, [(12, 9)])
        vis_dft = dft_skycomponent_visibility(vis, comps)
        pixels = jnp.zeros_like(model.pixels)
        pixels = pixels.at[0, 0, NPIX // 2 + 9, NPIX // 2 + 12].set(1.0)
        uvw_l = vis.uvw_lambda
        uu = uvw_l[..., 0].reshape(-1)
        vv = uvw_l[..., 1].reshape(-1)
        ww = uvw_l[..., 2].reshape(-1)
        truth = np.asarray(vis_dft.vis[..., 0]).reshape(-1)
        errs = {}
        for mode, nw in (("linear", 16), ("nearest", 32)):
            vals = predict_core(
                uu, vv, ww, pixels[0, 0], cellsize=model.cellsize,
                support=8, nw=nw, do_wstacking=True, w_interp=mode,
            )
            errs[mode] = float(np.max(np.abs(np.asarray(vals) - truth)))
        # linear interp is second-order accurate; nearest (classic
        # w-stacking) is first-order — both must beat no-w-correction
        assert errs["linear"] < 1e-4, errs
        assert errs["nearest"] < 1e-2, errs
        assert errs["linear"] < errs["nearest"], errs
