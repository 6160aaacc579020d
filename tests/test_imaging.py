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

    @staticmethod
    def _reference_weights(vis, model, weighting, robustness):
        """The reference's numpy algorithm, transcribed from
        grid_data/gridding.py:258-332 (density grid with conjugate
        points) and :413-489 (uniform / Briggs-robust reweighting,
        Briggs thesis eqs. 3.15-3.16)."""
        npixel = model.npixel
        scale = npixel * model.cellsize
        uvw_l = np.asarray(vis.uvw_lambda)
        u_pix = -uvw_l[..., 0] * scale + npixel // 2
        v_pix = uvw_l[..., 1] * scale + npixel // 2
        fw = np.asarray(vis.flagged_weight)
        T, B, F, P = fw.shape
        iu = np.round(u_pix).astype(int).ravel()
        iv = np.round(v_pix).astype(int).ravel()
        iuc, ivc = npixel - iu, npixel - iv
        ok = (
            (iu >= 0) & (iu < npixel) & (iv >= 0) & (iv < npixel)
            & (iuc >= 0) & (iuc < npixel) & (ivc >= 0) & (ivc < npixel)
        )
        out = np.zeros_like(fw)
        for pol in range(P):
            wts = fw[..., pol].ravel()
            grid = np.zeros((npixel, npixel))
            np.add.at(grid, (iv[ok], iu[ok]), wts[ok])
            np.add.at(grid, (ivc[ok], iuc[ok]), wts[ok])
            sumwt = 2.0 * wts[ok].sum()
            gdwt = np.where(ok, grid[np.clip(iv, 0, npixel - 1),
                                     np.clip(iu, 0, npixel - 1)], 0.0)
            new = np.zeros_like(wts)
            pos = ok & (gdwt > 0)
            if weighting == "uniform":
                new[pos] = wts[pos] / gdwt[pos]
            else:
                sumlocwt = np.sum(grid**2)
                f2 = (
                    (5.0 * 10.0 ** (-robustness)) ** 2 * sumwt / sumlocwt
                )
                new[pos] = wts[pos] / (1.0 + f2 * gdwt[pos])
            out[..., pol] = new.reshape(T, B, F)
        return out

    def test_uniform_weighting_matches_reference_formula(self):
        vis, model = _vis_and_image()
        wv = weight_visibility(vis, model, weighting="uniform")
        ref = self._reference_weights(vis, model, "uniform", 0.0)
        got = np.asarray(wv.flagged_imaging_weight)
        assert np.max(np.abs(got - ref)) < 1e-10, np.max(np.abs(got - ref))

    def test_robust_weighting_matches_reference_formula(self):
        vis, model = _vis_and_image()
        for robustness in (-2.0, 0.0, 2.0):
            wv = weight_visibility(
                vis, model, weighting="robust", robustness=robustness
            )
            ref = self._reference_weights(vis, model, "robust", robustness)
            got = np.asarray(wv.flagged_imaging_weight)
            assert np.max(np.abs(got - ref)) < 1e-10, robustness

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

    def test_advise_matches_reference_formulas(self):
        """Key-for-key comparison against the reference's advice formulas
        (imaging/base.py:441-790), transcribed here with numpy."""
        vis, _ = _vis_and_image()
        delA, osb, guard, facets = 0.02, 3.0, 6.0, 2
        advice = advise_wide_field(
            vis, delA=delA, oversampling_synthesised_beam=osb,
            guard_band_image=guard, facets=facets,
        )
        C = 299792458.0
        freq = np.asarray(vis.frequency)
        max_wl = C / freq.min()
        min_wl = C / freq.max()
        uvw = np.asarray(vis.uvw)
        max_bl = np.max(np.abs(uvw)) / min_wl
        max_w = np.max(np.abs(uvw[..., 2])) / min_wl
        diameter = vis.station_diameter
        pb_fov = max_wl / diameter
        image_fov = pb_fov * guard
        facet_fov = pb_fov * guard / facets
        syn_beam = 1.0 / max_bl
        cellsize = syn_beam / osb
        npixels = int(round(image_fov / cellsize))

        def pwr2(n):
            return int(2 ** int(np.ceil(np.log(n) / np.log(2.0))))

        def pwr23(n):
            best = pwr2(n)
            return best * 3 // 4 if best * 3 // 4 >= n else best

        def pwr2345(n):
            number = np.array([2, 3, 4, 5])
            ex = np.ceil(np.log(n) / np.log(number)).astype("int")
            return int(min(np.power(number[:], ex[:])))

        w_s_img = np.sqrt(2.0 * delA) / (np.pi * image_fov**2)
        w_s_fac = np.sqrt(2.0 * delA) / (np.pi * facet_fov**2)
        w_s_pb = np.sqrt(2.0 * delA) / (np.pi * pb_fov**2)
        expected = {
            "max_wavelength": max_wl,
            "min_wavelength": min_wl,
            "maximum_baseline": max_bl,
            "maximum_w": max_w,
            "diameter": diameter,
            "primary_beam_fov": pb_fov,
            "image_fov": image_fov,
            "facet_fov": facet_fov,
            "synthesized_beam": syn_beam,
            "cellsize": cellsize,
            "npixels": npixels,
            "npixels2": pwr2(npixels),
            "npixels23": pwr23(npixels),
            "npixels_min": pwr2345(npixels),
            "w_sampling_image": w_s_img,
            "w_sampling_facet": w_s_fac,
            "w_sampling_primary_beam": w_s_pb,
            "time_sampling_image": 86400.0 * syn_beam / image_fov,
            "time_sampling_primary_beam": 86400.0 * syn_beam / pb_fov,
            "max_freq": freq.max(),
            "freq_sampling_image": freq.max() * syn_beam / image_fov,
            "freq_sampling_primary_beam": freq.max() * syn_beam / pb_fov,
            "wstep_primary_beam": w_s_pb,
            "vis_slices_primary_beam": max(1, int(2 * max_w / w_s_pb)),
            "wstep_image": w_s_img,
            "vis_slices_image": max(1, int(2 * max_w / w_s_img)),
        }
        expected["wprojection_planes_primary_beam"] = expected[
            "vis_slices_primary_beam"
        ]
        expected["wprojection_planes_image"] = expected["vis_slices_image"]
        nw_pb = int(2.0 * expected["vis_slices_primary_beam"] * pb_fov)
        expected["nwpixels_primary_beam"] = nw_pb - nw_pb % 2
        nw_im = int(2.0 * expected["vis_slices_image"] * image_fov)
        expected["nwpixels_image"] = nw_im - nw_im % 2
        for key, val in expected.items():
            assert key in advice, key
            assert np.isclose(advice[key], val, rtol=1e-12), (
                key, advice[key], val,
            )
        # the reference also returns the call parameters
        for key in ("delA", "oversampling_synthesised_beam",
                    "guard_band_image", "facets", "verbose"):
            assert key in advice


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


class TestAutoPlanCache:
    """Automatic plan caching in the composed public API: second calls on
    the same (uvw, frequency) buffers reuse the cached geometry (no
    re-sort), and results match the uncached core path exactly."""

    def test_cache_hit_and_parity(self):
        from ska_sdp_func_python_tpu import config
        from ska_sdp_func_python_tpu.ops import imaging as im

        vis, model = _vis_and_image()
        comps = _point_comps(model, [(-6, 11)], flux=1.5)
        vis = dft_skycomponent_visibility(vis, comps)

        im._PLAN_CACHE.clear()
        ref, sw_ref = invert_visibility(
            vis, model, context="ng", nw=8, auto_plan=False
        )
        d1, sw1 = invert_visibility(
            vis, model, context="ng", nw=8, auto_plan=True
        )
        assert len(im._PLAN_CACHE) == 1
        (key1, (uvw_ref, _, plan1)), = im._PLAN_CACHE.items()
        assert uvw_ref is vis.uvw
        d2, sw2 = invert_visibility(
            vis, model, context="ng", nw=8, auto_plan=True
        )
        # same plan object reused (cache hit, no rebuild)
        assert im._PLAN_CACHE[key1][2] is plan1
        np.testing.assert_allclose(
            np.asarray(d1.pixels), np.asarray(d2.pixels)
        )
        # plan path matches the core path at the same padding
        np.testing.assert_allclose(
            np.asarray(d1.pixels), np.asarray(ref.pixels),
            atol=2e-6 * float(np.max(np.abs(np.asarray(ref.pixels)))),
        )
        np.testing.assert_allclose(np.asarray(sw1), np.asarray(sw_ref))

        # predict shares the same cache key space
        vpred = predict_visibility(
            vis, model, context="ng", nw=8, auto_plan=True
        )
        assert vpred.vis.shape == vis.vis.shape

        # different coordinates -> new entry; LRU bounded by config size
        vis2, model2 = _vis_and_image(ntimes=2)
        invert_visibility(vis2, model2, context="ng", nw=8, auto_plan=True)
        assert len(im._PLAN_CACHE) <= config.plan_cache_size()
        im._PLAN_CACHE.clear()

    def test_cache_disabled(self):
        from ska_sdp_func_python_tpu import config
        from ska_sdp_func_python_tpu.ops import imaging as im

        vis, model = _vis_and_image()
        im._PLAN_CACHE.clear()
        config.set_plan_cache_size(0)
        try:
            invert_visibility(vis, model, context="ng", nw=8, auto_plan=True)
            assert len(im._PLAN_CACHE) == 0
        finally:
            config.set_plan_cache_size(2)
