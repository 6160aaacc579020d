"""M5 composite-layer tests: chain calibration, skymodel predict/invert,
sky-component ops, facet/channel scatter-gather, and the ICAL self-cal
pipeline end-to-end (mirrors reference tests/calibration/
test_chain_calibration.py and tests/sky_model/test_skymodel_imaging.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ska_sdp_func_python_tpu.models import (
    SkyComponents,
    SkyModel,
    create_gaintable_from_visibility,
    create_image,
)
from ska_sdp_func_python_tpu.ops import (
    apply_beam_to_skycomponent,
    apply_gaintable,
    calibrate_chain,
    create_calibration_controls,
    create_image_from_visibility,
    dft_skycomponent_visibility,
    filter_skycomponents_by_flux,
    find_skycomponent_matches,
    find_skycomponents,
    image_gather_channels,
    image_gather_facets,
    image_scatter_channels,
    image_scatter_facets,
    insert_skycomponent,
    partition_skycomponent_neighbours,
    skymodel_calibrate_invert,
    skymodel_predict_calibrate,
    sum_invert_results,
    sum_predict_results,
    threshold_list,
)
from ska_sdp_func_python_tpu.pipeline import ical, continuum_imaging

from simul import make_visibility
from test_solvers import _simulate_gaintable

PC = (0.0, np.deg2rad(-35.0))


def _pointish_obs(rng, nants=10, flux=1.5, offset=(8, -5), npixel=128):
    vis = make_visibility(
        nants=nants, ntimes=3, nchan=1, rmax=300.0, phasecentre=PC
    )
    model = create_image_from_visibility(
        vis, npixel=npixel, oversampling=4.0, nchan=1
    )
    ra, dec = model.pixel_to_radec(
        npixel // 2 + offset[0], npixel // 2 + offset[1]
    )
    comps = SkyComponents.from_lists(
        [[float(ra), float(dec)]], [[[flux]]], vis.frequency
    )
    vis = dft_skycomponent_visibility(vis, comps)
    return vis, model, comps


class TestChainCalibration:
    def test_calibrate_chain_T_recovers(self, rng):
        vis, model, comps = _pointish_obs(rng)
        gt_true = create_gaintable_from_visibility(vis, jones_type="T")
        gt_true = _simulate_gaintable(gt_true, rng, phase_error=0.2)
        corrupted = apply_gaintable(vis, gt_true)
        cvis, gts = calibrate_chain(
            corrupted, vis, calibration_context="T"
        )
        assert "T" in gts
        np.testing.assert_allclose(
            np.asarray(cvis.vis), np.asarray(vis.vis), atol=1e-6
        )

    def test_controls_defaults(self):
        controls = create_calibration_controls()
        assert controls["T"]["phase_only"] is True
        assert controls["G"]["timeslice"] == 60.0
        assert controls["B"]["timeslice"] == 1e5


class TestSkymodelImaging:
    def test_predict_components_plus_image(self, rng):
        vis, model, comps = _pointish_obs(rng)
        sm = SkyModel(
            image=None, components=comps, gaintable=None, mask=None
        )
        pred = skymodel_predict_calibrate(vis, sm, context="2d")
        np.testing.assert_allclose(
            np.asarray(pred.vis), np.asarray(vis.vis), atol=1e-6
        )

    def test_predict_with_calibration(self, rng):
        vis, model, comps = _pointish_obs(rng)
        gt = create_gaintable_from_visibility(vis, jones_type="T")
        gt = _simulate_gaintable(gt, rng, 0.1)
        sm = SkyModel(
            image=None, components=comps, gaintable=gt, mask=None
        )
        pred = skymodel_predict_calibrate(
            vis, sm, context="2d", docal=True, inverse=True
        )
        # applying the gaintable forward should corrupt; inverse==True
        # corrects, i.e. pred != plain DFT but invertible back
        assert np.max(np.abs(np.asarray(pred.vis))) > 0

    def test_calibrate_invert(self, rng):
        vis, model, comps = _pointish_obs(rng)
        sm = SkyModel(
            image=model, components=None, gaintable=None, mask=None
        )
        dirty, sumwt = skymodel_calibrate_invert(vis, sm, context="ng")
        img = np.asarray(dirty.pixels)[0, 0]
        iy, ix = np.unravel_index(np.argmax(img), img.shape)
        assert (ix, iy) == (128 // 2 + 8, 128 // 2 - 5)

    def test_predict_with_pb(self, rng):
        vis, model, comps = _pointish_obs(rng)

        def get_pb(vis_slice, image):
            # simple circular gaussian PB
            ny, nx = image.pixels.shape[-2:]
            iy, ix = jnp.mgrid[0:ny, 0:nx]
            r2 = (iy - ny // 2) ** 2 + (ix - nx // 2) ** 2
            pb = jnp.exp(-r2 / (2 * (nx / 4.0) ** 2))
            return image.replace(
                pixels=jnp.broadcast_to(pb, image.pixels.shape)
            )

        sm = SkyModel(
            image=model, components=comps, gaintable=None, mask=None
        )
        pred = skymodel_predict_calibrate(
            vis, sm, context="2d", get_pb=get_pb
        )
        # PB < 1 away from centre -> predicted amplitude reduced
        assert 0 < np.max(np.abs(np.asarray(pred.vis))) < 1.5


class TestSkyComponents:
    def test_insert_and_find_roundtrip(self, rng):
        model = create_image(128, 0.001, PC)
        npix = 128
        dirs = []
        for dx, dy in [(10, 12), (-20, 5), (25, -18)]:
            ra, dec = model.pixel_to_radec(npix // 2 + dx, npix // 2 + dy)
            dirs.append([float(ra), float(dec)])
        comps = SkyComponents.from_lists(
            dirs, np.full((3, 1, 1), 2.0), model.frequency
        )
        im = insert_skycomponent(model, comps, insert_method="Nearest")
        found = find_skycomponents(im, fwhm=1.0, threshold=0.5, npixels=1)
        assert found.ncomp == 3
        matches = find_skycomponent_matches(found, comps, tol=1e-4)
        assert len(matches) == 3

    def test_deblend_separates_blended_sources(self, rng):
        """Two gaussians whose threshold islands merge: plain labelling
        finds ONE island, deblending (multi-threshold watershed,
        photutils deblend_sources semantics) recovers both peaks."""
        from scipy import ndimage

        model = create_image(128, 0.001, PC)
        det = np.zeros((128, 128), np.float32)
        yy, xx = np.mgrid[0:128, 0:128]
        for (cy, cx, amp) in [(64, 59, 2.0), (64, 69, 1.4)]:
            det += amp * np.exp(
                -(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 3.0**2))
            )
        im = model.with_pixels(
            jnp.asarray(det[None, None].astype(np.float32))
        )
        merged = find_skycomponents(
            im, fwhm=0.0, threshold=0.3, npixels=5, deblend=False
        )
        assert merged.ncomp == 1, merged.ncomp
        split = find_skycomponents(
            im, fwhm=0.0, threshold=0.3, npixels=5, deblend=True
        )
        assert split.ncomp == 2, split.ncomp
        # both peak positions recovered to within a pixel
        px = [
            model.radec_to_pixel(float(r), float(d))
            for r, d in np.asarray(split.direction)
        ]
        xs = sorted(float(p_[0]) for p_ in px)
        assert abs(xs[0] - 59) < 2.5 and abs(xs[1] - 69) < 2.5, xs
        # island flux splits roughly by component brightness
        f = sorted(float(v) for v in np.asarray(split.flux)[:, 0, 0])
        assert f[1] > f[0] > 0

    def test_insert_lanczos(self, rng):
        model = create_image(64, 0.001, PC)
        ra, dec = model.pixel_to_radec(32.3, 30.7)
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]], np.ones((1, 1, 1)), model.frequency
        )
        im = insert_skycomponent(
            model, comps, insert_method="Lanczos", support=7
        )
        total = float(jnp.sum(im.pixels))
        np.testing.assert_allclose(total, 1.0, rtol=1e-6)

    def test_apply_beam(self, rng):
        model = create_image(64, 0.001, PC)
        beam = model.replace(pixels=0.5 * jnp.ones_like(model.pixels))
        ra, dec = model.pixel_to_radec(40, 20)
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]], np.ones((1, 1, 1)), model.frequency
        )
        out = apply_beam_to_skycomponent(comps, beam)
        np.testing.assert_allclose(float(out.flux[0, 0, 0]), 0.5)
        back = apply_beam_to_skycomponent(out, beam, inverse=True)
        np.testing.assert_allclose(float(back.flux[0, 0, 0]), 1.0)

    def test_filter_and_partition(self, rng):
        model = create_image(64, 0.001, PC)
        dirs = [
            model.pixel_to_radec(20, 20),
            model.pixel_to_radec(40, 44),
        ]
        dirs = [[float(a), float(b)] for a, b in dirs]
        comps = SkyComponents.from_lists(
            dirs, np.array([[[0.5]], [[2.0]]]), model.frequency
        )
        bright = filter_skycomponents_by_flux(comps, flux_min=1.0)
        assert bright.ncomp == 1
        parts = partition_skycomponent_neighbours(
            comps, np.asarray(comps.direction)
        )
        assert parts[0].ncomp == 1 and parts[1].ncomp == 1


class TestIterators:
    def test_facet_scatter_gather_roundtrip(self, rng):
        model = create_image(64, 0.001, PC)
        model = model.replace(
            pixels=jnp.asarray(rng.normal(size=model.pixels.shape))
        )
        for overlap, taper in [(0, "flat"), (8, "linear"), (8, "tukey")]:
            facets = image_scatter_facets(
                model, facets=2, overlap=overlap, taper=taper
            )
            back = image_gather_facets(
                facets, model, facets=2, overlap=overlap, taper=taper
            )
            np.testing.assert_allclose(
                np.asarray(back.pixels),
                np.asarray(model.pixels),
                atol=1e-10,
                err_msg=f"overlap={overlap} taper={taper}",
            )

    def test_raster_update_writeback(self, rng):
        """image_raster_update: the functional form of the reference's
        mutable-view writeback (iterators.py:66-190) — a per-facet map
        reassembles exactly like editing the views in place."""
        from ska_sdp_func_python_tpu.ops import image_raster_update

        model = create_image(64, 0.001, PC)
        model = model.replace(
            pixels=jnp.asarray(rng.normal(size=model.pixels.shape))
        )
        for overlap, taper in [(0, "flat"), (8, "tukey")]:
            out = image_raster_update(
                model,
                lambda f: f.replace(pixels=f.pixels * 2.0),
                facets=2, overlap=overlap, taper=taper,
            )
            np.testing.assert_allclose(
                np.asarray(out.pixels),
                2.0 * np.asarray(model.pixels),
                atol=1e-10,
                err_msg=f"overlap={overlap} taper={taper}",
            )

    def test_channel_scatter_gather(self, rng):
        freq = 1e8 + 1e6 * np.arange(6)
        model = create_image(32, 0.001, PC, frequency=freq)
        model = model.replace(
            pixels=jnp.asarray(rng.normal(size=model.pixels.shape))
        )
        chans = image_scatter_channels(model)
        assert len(chans) == 6
        back = image_gather_channels(chans)
        np.testing.assert_allclose(
            np.asarray(back.pixels), np.asarray(model.pixels)
        )


class TestHelpers:
    def test_sum_invert_results(self, rng):
        model = create_image(32, 0.001, PC)
        im1 = model.replace(pixels=jnp.ones_like(model.pixels))
        im2 = model.replace(pixels=3.0 * jnp.ones_like(model.pixels))
        swt = np.ones((1, 1))
        summed, total = sum_invert_results([(im1, swt), (im2, swt)])
        np.testing.assert_allclose(np.asarray(summed.pixels), 2.0)
        np.testing.assert_allclose(np.asarray(total), 2.0)

    def test_threshold_list(self, rng):
        model = create_image(32, 0.001, PC)
        im = model.replace(pixels=2.0 * jnp.ones_like(model.pixels))
        actual = threshold_list([im], 0.0, 0.1)
        np.testing.assert_allclose(actual, 0.2)


class TestPipelines:
    def test_continuum_imaging_converges(self, rng):
        vis, model, comps = _pointish_obs(rng, flux=2.0)
        deconvolved, residual, restored = continuum_imaging(
            vis,
            model,
            nmajor=3,
            context="ng",
            algorithm="hogbom",
            niter=200,
            gain=0.2,
            fractional_threshold=0.01,
        )
        assert float(jnp.max(jnp.abs(residual.pixels))) < 0.1
        # restored peak ~ flux
        peak = float(jnp.max(restored.pixels))
        assert abs(peak - 2.0) < 0.1, peak

    def test_ical_selfcal_recovers_after_corruption(self, rng):
        vis, model, comps = _pointish_obs(rng, flux=2.0)
        gt_true = create_gaintable_from_visibility(vis, jones_type="T")
        gt_true = _simulate_gaintable(gt_true, rng, phase_error=0.3)
        corrupted = apply_gaintable(vis, gt_true)
        deconvolved, residual, restored, gts = ical(
            corrupted,
            model,
            nmajor=4,
            calibration_context="T",
            context="ng",
            algorithm="hogbom",
            niter=200,
            gain=0.2,
            fractional_threshold=0.01,
        )
        assert "T" in gts
        assert float(jnp.max(jnp.abs(residual.pixels))) < 0.2
        peak = float(jnp.max(restored.pixels))
        assert abs(peak - 2.0) < 0.2, peak

    def test_continuum_fused_windowed_mmclean_matches_composed(self, rng):
        """Windowed MSMFS now runs in the fused lane (round 3; was
        composed-only): the quarter window masks the moment-domain peak
        search through msmfsclean's scale-convolved window stack."""
        nchan = 6
        vis = make_visibility(
            nants=12, ntimes=3, nchan=nchan, frequency0=1.0e8,
            channel_bandwidth=4e6, rmax=300.0, phasecentre=PC,
        )
        npixel = 64
        model = create_image_from_visibility(
            vis, npixel=npixel, oversampling=4.0, nchan=nchan
        )
        ra, dec = model.pixel_to_radec(npixel // 2 + 5, npixel // 2 - 3)
        f0 = np.asarray(vis.frequency)
        flux = (2.0 * (f0 / f0[nchan // 2]) ** -0.7)[None, :, None]
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]], flux, vis.frequency
        )
        vis = dft_skycomponent_visibility(vis, comps)
        kw = dict(
            nmajor=2, context="ng", algorithm="mmclean", nmoment=2,
            niter=80, fractional_threshold=0.01, window_shape="quarter",
        )
        d0, r0, s0 = continuum_imaging(vis, model, fused=False, **kw)
        d1, r1, s1 = continuum_imaging(
            vis, model, use_plan=True, fused=True, **kw
        )
        r0p = float(jnp.max(jnp.abs(r0.pixels)))
        r1p = float(jnp.max(jnp.abs(r1.pixels)))
        assert abs(r0p - r1p) < 1e-3 * max(r0p, 1e-6), (r0p, r1p)

    def test_continuum_fused_cube_mmclean_matches_composed(self, rng):
        """Channel-batched fused cube cycle (vmapped plans) with in-graph
        MSMFS matches the composed loop on a spectral-index source."""
        nchan = 6
        vis = make_visibility(
            nants=14,
            ntimes=3,
            nchan=nchan,
            frequency0=1.0e8,
            channel_bandwidth=4e6,
            rmax=300.0,
            phasecentre=PC,
        )
        npixel = 96
        model = create_image_from_visibility(
            vis, npixel=npixel, oversampling=4.0, nchan=nchan
        )
        ra, dec = model.pixel_to_radec(npixel // 2 + 7, npixel // 2 - 4)
        f0 = np.asarray(vis.frequency)
        flux = (2.0 * (f0 / f0[nchan // 2]) ** -0.7)[None, :, None]
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]], flux, vis.frequency
        )
        vis = dft_skycomponent_visibility(vis, comps)
        kw = dict(
            nmajor=2,
            context="ng",
            algorithm="mmclean",
            nmoment=2,
            niter=100,
            fractional_threshold=0.01,
        )
        d0, r0, s0 = continuum_imaging(vis, model, **kw)
        d1, r1, s1 = continuum_imaging(
            vis, model, use_plan=True, fused=True, **kw
        )
        r0p = float(jnp.max(jnp.abs(r0.pixels)))
        r1p = float(jnp.max(jnp.abs(r1.pixels)))
        assert abs(r0p - r1p) < 1e-3 * max(r0p, 1e-6), (r0p, r1p)
        s0p = float(jnp.max(jnp.abs(s0.pixels)))
        s1p = float(jnp.max(jnp.abs(s1.pixels)))
        assert abs(s0p - s1p) < 0.02 * max(s0p, 1e-6), (s0p, s1p)

    def test_ical_fused_cube_matches_composed(self, rng):
        """Cube-mode fused ICAL (per-channel plans, one vmapped program)
        vs the composed loop: same gains, same residual."""
        nchan = 3
        vis = make_visibility(
            nants=12,
            ntimes=3,
            nchan=nchan,
            rmax=300.0,
            phasecentre=PC,
        )
        npixel = 96
        model = create_image_from_visibility(
            vis, npixel=npixel, oversampling=4.0, nchan=nchan
        )
        ra, dec = model.pixel_to_radec(npixel // 2 + 7, npixel // 2 - 4)
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]],
            np.full((1, nchan, 1), 2.0),
            vis.frequency,
        )
        vis = dft_skycomponent_visibility(vis, comps)
        gt_true = create_gaintable_from_visibility(vis, jones_type="T")
        gt_true = _simulate_gaintable(gt_true, rng, phase_error=0.3)
        corrupted = apply_gaintable(vis, gt_true)
        kw = dict(
            nmajor=3,
            calibration_context="T",
            context="ng",
            algorithm="hogbom",
            niter=150,
            gain=0.2,
            fractional_threshold=0.01,
        )
        d0, r0, s0, g0 = ical(corrupted, model, **kw)
        d1, r1, s1, g1 = ical(
            corrupted, model, use_plan=True, fused=True, **kw
        )
        ga = np.asarray(g0["T"].gain)[..., 0, 0]
        gb = np.asarray(g1["T"].gain)[..., 0, 0]
        pa = ga * np.exp(-1j * np.angle(ga[:, :1]))
        pb = gb * np.exp(-1j * np.angle(gb[:, :1]))
        assert np.max(np.abs(pa - pb)) < 1e-4
        r1p = float(jnp.max(jnp.abs(r1.pixels)))
        assert r1p < 0.2, r1p

    def test_ical_fused_tg_chain(self, rng):
        """Multi-term fused chain (T then G, sequential in-graph solves)
        matches the composed calibrate_chain loop."""
        vis, model, comps = _pointish_obs(rng, flux=2.0)
        gt_t = create_gaintable_from_visibility(vis, jones_type="T")
        gt_t = _simulate_gaintable(gt_t, rng, phase_error=0.25)
        gt_g = create_gaintable_from_visibility(
            vis, jones_type="G", timeslice=60.0
        )
        gt_g = _simulate_gaintable(
            gt_g, rng, phase_error=0.1, amplitude_error=0.05
        )
        corrupted = apply_gaintable(
            apply_gaintable(vis, gt_t), gt_g
        )
        kw = dict(
            nmajor=4,
            calibration_context="TG",
            context="ng",
            algorithm="hogbom",
            niter=200,
            gain=0.2,
            fractional_threshold=0.01,
        )
        d0, r0, s0, g0 = ical(corrupted, model, **kw)
        d1, r1, s1, g1 = ical(
            corrupted, model, use_plan=True, fused=True, **kw
        )
        assert set(g1) == {"T", "G"}
        r0p = float(jnp.max(jnp.abs(r0.pixels)))
        r1p = float(jnp.max(jnp.abs(r1.pixels)))
        assert r1p < 0.2, r1p
        assert abs(r0p - r1p) < 0.02
        assert abs(
            float(jnp.max(s0.pixels)) - float(jnp.max(s1.pixels))
        ) < 0.05

    def test_ical_fused_npol4_diagonal(self, rng):
        """npol=4 fused self-cal with diagonal Jones in the linear frame
        (both receptors carry flux) recovers the source and matches the
        composed loop. A stokes-frame I-only cube is NOT a valid self-cal
        configuration: the second receptor has no data, the solved g11 is
        ~0, and the reference's own singular-inverse apply zeroes the
        visibilities."""
        vis = make_visibility(
            nants=10,
            ntimes=3,
            nchan=1,
            rmax=300.0,
            phasecentre=PC,
            polarisation_frame="linear",
        )
        model = create_image_from_visibility(
            vis, npixel=128, oversampling=4.0, nchan=1
        )
        ra, dec = model.pixel_to_radec(128 // 2 + 8, 128 // 2 - 5)
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]],
            np.asarray([[[2.0, 0.0, 0.0, 0.0]]]),
            vis.frequency,
            polarisation_frame="stokesIQUV",
        )
        vis = dft_skycomponent_visibility(vis, comps)
        gt_true = create_gaintable_from_visibility(vis, jones_type="T")
        gt_true = _simulate_gaintable(gt_true, rng, phase_error=0.3)
        corrupted = apply_gaintable(vis, gt_true)
        # seed the sky model with the components: the reference's "ng" PSF
        # convention (ng.py:230-233) puts the beam in pol 0 only and its
        # CLEAN skips zero-PSF pols, so a from-scratch npol-4 loop never
        # populates the YY model and the solve is rank-deficient in the
        # second receptor — in the reference too
        kw = dict(
            nmajor=3,
            calibration_context="T",
            context="ng",
            components=comps,
            algorithm="hogbom",
            niter=200,
            gain=0.2,
            fractional_threshold=0.01,
        )
        d0, r0, s0, g0 = ical(corrupted, model, **kw)
        d1, r1, s1, g1 = ical(
            corrupted, model, use_plan=True, fused=True, **kw
        )
        r1p = float(jnp.max(jnp.abs(r1.pixels)))
        assert r1p < 0.2, r1p
        # XX/YY hands each carry I+Q = 2.0 (restored adds the components)
        assert abs(float(jnp.max(jnp.abs(s1.pixels))) - 2.0) < 0.2
        assert abs(
            float(jnp.max(jnp.abs(s0.pixels)))
            - float(jnp.max(jnp.abs(s1.pixels)))
        ) < 0.05

    def test_ical_fused_with_flags_matches_composed(self, rng):
        """Flagged rows must drop out of both the solve and the imaging
        legs of the fused cycle exactly as in the composed loop."""
        vis, model, comps = _pointish_obs(rng, flux=2.0)
        flags = np.zeros(vis.flags.shape, dtype=np.int32)
        flags[1, ::7] = 1  # flag every 7th baseline of time 1
        vis = vis.replace(flags=jnp.asarray(flags))
        gt_true = create_gaintable_from_visibility(vis, jones_type="T")
        gt_true = _simulate_gaintable(gt_true, rng, phase_error=0.3)
        corrupted = apply_gaintable(vis, gt_true)
        kw = dict(
            nmajor=3,
            calibration_context="T",
            context="ng",
            algorithm="hogbom",
            niter=200,
            gain=0.2,
            fractional_threshold=0.01,
        )
        d0, r0, s0, g0 = ical(corrupted, model, **kw)
        d1, r1, s1, g1 = ical(
            corrupted, model, use_plan=True, fused=True, **kw
        )
        ga = np.asarray(g0["T"].gain)[..., 0, 0]
        gb = np.asarray(g1["T"].gain)[..., 0, 0]
        pa = ga * np.exp(-1j * np.angle(ga[:, :1]))
        pb = gb * np.exp(-1j * np.angle(gb[:, :1]))
        assert np.max(np.abs(pa - pb)) < 1e-4
        r0p = float(jnp.max(jnp.abs(r0.pixels)))
        r1p = float(jnp.max(jnp.abs(r1.pixels)))
        assert abs(r0p - r1p) < 1e-3 * max(r0p, 1e-6)

    def test_ical_fused_checkpoint_resume(self, rng, tmp_path):
        """SelfCalState checkpointing through the fused path: resuming
        from the cycle-2 checkpoint reproduces the uninterrupted run."""
        from ska_sdp_func_python_tpu.pipeline import SelfCalState

        vis, model, comps = _pointish_obs(rng, flux=2.0)
        gt_true = create_gaintable_from_visibility(vis, jones_type="T")
        gt_true = _simulate_gaintable(gt_true, rng, phase_error=0.3)
        corrupted = apply_gaintable(vis, gt_true)
        ckpt = str(tmp_path / "selfcal.pkl")
        kw = dict(
            calibration_context="T",
            context="ng",
            use_plan=True,
            fused=True,
            algorithm="hogbom",
            niter=200,
            gain=0.2,
            fractional_threshold=0.01,
        )
        d_full, r_full, s_full, g_full = ical(
            corrupted, model, nmajor=4, **kw
        )
        ical(
            corrupted, model, nmajor=2, checkpoint_path=ckpt, **kw
        )
        state = SelfCalState.load(ckpt)
        assert state.cycle == 2
        d_res, r_res, s_res, g_res = ical(
            corrupted, model, nmajor=4, state=state, **kw
        )
        np.testing.assert_allclose(
            np.asarray(d_res.pixels),
            np.asarray(d_full.pixels),
            atol=1e-6,
        )
        r_full_p = float(jnp.max(jnp.abs(r_full.pixels)))
        r_res_p = float(jnp.max(jnp.abs(r_res.pixels)))
        assert abs(r_full_p - r_res_p) < 1e-6

    def test_continuum_fused_matches_composed(self, rng):
        """continuum_imaging(fused=True) — the do_cal=False instantiation
        of the fused cycle — reproduces the composed loop."""
        vis, model, comps = _pointish_obs(rng, flux=2.0)
        kw = dict(
            nmajor=3,
            context="ng",
            algorithm="hogbom",
            niter=200,
            gain=0.2,
            fractional_threshold=0.01,
        )
        d0, r0, s0 = continuum_imaging(vis, model, **kw)
        d1, r1, s1 = continuum_imaging(
            vis, model, use_plan=True, fused=True, **kw
        )
        r0p = float(jnp.max(jnp.abs(r0.pixels)))
        r1p = float(jnp.max(jnp.abs(r1.pixels)))
        assert abs(r0p - r1p) < 1e-3 * max(r0p, 1e-6)
        assert abs(
            float(jnp.max(s0.pixels)) - float(jnp.max(s1.pixels))
        ) < 0.05

    def test_ical_fused_matches_composed(self, rng):
        """The one-dispatch fused major cycle (pipeline._fused_selfcal_cycle)
        reproduces the composed predict/calibrate/subtract/invert/clean loop:
        same gains (phase-referenced), same residual peak, same sky."""
        vis, model, comps = _pointish_obs(rng, flux=2.0)
        gt_true = create_gaintable_from_visibility(vis, jones_type="T")
        gt_true = _simulate_gaintable(gt_true, rng, phase_error=0.3)
        corrupted = apply_gaintable(vis, gt_true)
        kw = dict(
            nmajor=3,
            calibration_context="T",
            context="ng",
            algorithm="hogbom",
            niter=200,
            gain=0.2,
            fractional_threshold=0.01,
        )
        d0, r0, s0, g0 = ical(corrupted, model, **kw)
        d1, r1, s1, g1 = ical(
            corrupted, model, use_plan=True, fused=True, **kw
        )
        ga = np.asarray(g0["T"].gain)[..., 0, 0]
        gb = np.asarray(g1["T"].gain)[..., 0, 0]
        pa = ga * np.exp(-1j * np.angle(ga[:, :1]))
        pb = gb * np.exp(-1j * np.angle(gb[:, :1]))
        assert np.max(np.abs(pa - pb)) < 1e-4
        r0p = float(jnp.max(jnp.abs(r0.pixels)))
        r1p = float(jnp.max(jnp.abs(r1.pixels)))
        assert abs(r0p - r1p) < 1e-3 * max(r0p, 1e-6)
        peak0 = float(jnp.max(s0.pixels))
        peak1 = float(jnp.max(s1.pixels))
        assert abs(peak0 - peak1) < 0.05


class TestConfiguration:
    def test_named_configuration_and_observe(self, rng):
        from ska_sdp_func_python_tpu.models import (
            create_named_configuration,
            create_visibility,
        )

        cfg = create_named_configuration("LOW", rmax=1000.0)
        assert 0 < cfg.nants < 512
        vis = create_visibility(
            cfg,
            np.linspace(-0.05, 0.05, 2),
            [1.0e8],
            elevation_limit=np.deg2rad(15.0),
        )
        assert vis.ntimes == 2
        assert vis.nbaselines == cfg.nants * (cfg.nants - 1) // 2
        # uvw magnitudes bounded by array diameter
        assert float(np.abs(np.asarray(vis.uvw)).max()) <= 2000.0


class TestFusedWindowedClean:
    @pytest.mark.parametrize("algorithm", ["hogbom", "msclean"])
    def test_fused_windowed_matches_composed(self, rng, algorithm):
        """window_shape='quarter' now runs IN-GRAPH in the fused cycle
        for the hogbom/msclean lanes; the result must match the composed
        path running the same windowed deconvolution."""
        vis, model, comps = _pointish_obs(rng, offset=(8, -5))
        kw = dict(
            nmajor=2,
            context="ng",
            algorithm=algorithm,
            niter=100,
            gain=0.2,
            fractional_threshold=0.01,
            window_shape="quarter",
        )
        c1, r1, s1 = continuum_imaging(
            vis, model, use_plan=True, fused=True, **kw
        )
        c0, r0, s0 = continuum_imaging(vis, model, fused=False, **kw)
        # component PEAKS must be confined to the central-quarter
        # window; msclean's extended scale blobs may spill low-level
        # tails past the window edge (reference behaviour — the window
        # constrains the search, not the blob support)
        cpix = np.asarray(c1.pixels)[0, 0]
        n = cpix.shape[0]
        outside = cpix.copy()
        outside[n // 4 + 1 : 3 * (n // 4), n // 4 + 1 : 3 * (n // 4)] = 0
        if algorithm == "hogbom":
            assert np.max(np.abs(outside)) == 0.0
        else:
            assert np.max(np.abs(outside)) < 1e-3 * np.max(np.abs(cpix))
        assert (
            abs(float(jnp.max(c1.pixels)) - float(jnp.max(c0.pixels)))
            < 2e-2
        )
        assert (
            abs(
                float(jnp.max(jnp.abs(r1.pixels)))
                - float(jnp.max(jnp.abs(r0.pixels)))
            )
            < 2e-2
        )


class TestFusedFullJones:
    def test_ical_fused_matrix_matches_composed(self, rng):
        """Full-Jones (crosspol, controls shape 'matrix') fused self-cal:
        the Mueller inverse-apply leg (kron(J1^-1, conj(J2^-1)) mixing
        the four pol columns) must match the composed calibrate_chain +
        apply_gaintable loop on npol-4 linear data corrupted by leaky
        2x2 Jones (reference matrix solver semantics,
        calibration/solvers.py:378-478)."""
        from test_solvers import _simulate_gaintable

        vis = make_visibility(
            nants=10, ntimes=3, nchan=1, rmax=300.0, phasecentre=PC,
            polarisation_frame="linear",
        )
        model = create_image_from_visibility(
            vis, npixel=128, oversampling=4.0, nchan=1,
            polarisation_frame="linear",
        )
        ra, dec = model.pixel_to_radec(128 // 2 + 8, 128 // 2 - 5)
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]],
            np.asarray([[[2.0, 0.3, 0.15, 0.0]]]),
            vis.frequency,
            polarisation_frame="stokesIQUV",
        )
        vis = dft_skycomponent_visibility(vis, comps)
        gt_true = create_gaintable_from_visibility(vis, jones_type="T")
        gt_true = _simulate_gaintable(
            gt_true, rng, phase_error=0.2, amplitude_error=0.05
        )
        # add off-diagonal leakage: the full 2x2 Jones the matrix solve
        # exists for
        g = np.array(gt_true.gain)
        leak = 0.08 * (
            rng.normal(size=g[..., 0, 1].shape)
            + 1j * rng.normal(size=g[..., 0, 1].shape)
        )
        g[..., 0, 1] = leak
        g[..., 1, 0] = np.conj(leak) * 0.7
        gt_true = gt_true.replace(gain=jnp.asarray(g))
        corrupted = apply_gaintable(vis, gt_true)

        controls = create_calibration_controls()
        controls["T"] = dict(controls["T"])
        controls["T"]["shape"] = "matrix"
        controls["T"]["phase_only"] = False
        kw = dict(
            nmajor=3, calibration_context="T", controls=controls,
            context="ng", components=comps, algorithm="hogbom",
            niter=200, gain=0.2, fractional_threshold=0.01,
        )
        d0, r0, s0, g0 = ical(corrupted, model, fused=False, **kw)
        d1, r1, s1, g1 = ical(
            corrupted, model, fused=True, use_plan=True, **kw
        )
        p0 = float(jnp.max(jnp.abs(r0.pixels)))
        p1 = float(jnp.max(jnp.abs(r1.pixels)))
        # full-Jones self-cal carries a per-antenna unitary gauge
        # ambiguity, so the meaningful check is PARITY with the
        # composed reference-semantics loop (measured 5e-7 resid /
        # 4e-6 gains), not absolute convergence
        assert abs(p0 - p1) < 1e-3, (p0, p1)
        ga = np.asarray(g0["T"].gain)
        gb = np.asarray(g1["T"].gain)
        assert np.max(np.abs(ga - gb)) < 1e-4, np.max(np.abs(ga - gb))

    def test_ical_fused_matrix_plus_bandpass_chain(self, rng):
        """Full-Jones 'T' (matrix, Fc=1) chained with per-channel 'B'
        (Fc=nchan) on multi-channel vis with an MFS model: the Mueller
        inverse-factor chain must broadcast the frequency axis before
        composing (round-3 advisor finding — this combination used to
        fail at trace time in the fused gate). Parity vs the composed
        calibrate_chain loop."""
        from test_solvers import _simulate_gaintable
        from ska_sdp_func_python_tpu.models import (
            create_gaintable_from_visibility,
        )
        from ska_sdp_func_python_tpu.ops import apply_gaintable

        nchan = 2
        vis = make_visibility(
            nants=8, ntimes=2, nchan=nchan, rmax=300.0, phasecentre=PC,
            polarisation_frame="linear",
        )
        model = create_image_from_visibility(
            vis, npixel=128, oversampling=4.0, nchan=1,
            polarisation_frame="linear",
        )
        ra, dec = model.pixel_to_radec(128 // 2 + 8, 128 // 2 - 5)
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]],
            np.tile(
                np.asarray([[[2.0, 0.3, 0.15, 0.0]]]), (1, nchan, 1)
            ),
            vis.frequency,
            polarisation_frame="stokesIQUV",
        )
        vis = dft_skycomponent_visibility(vis, comps)
        gt_t = create_gaintable_from_visibility(vis, jones_type="T")
        gt_t = _simulate_gaintable(
            gt_t, rng, phase_error=0.2, amplitude_error=0.05
        )
        g = np.array(gt_t.gain)
        leak = 0.08 * (
            rng.normal(size=g[..., 0, 1].shape)
            + 1j * rng.normal(size=g[..., 0, 1].shape)
        )
        g[..., 0, 1] = leak
        g[..., 1, 0] = np.conj(leak) * 0.7
        gt_t = gt_t.replace(gain=jnp.asarray(g))
        gt_b = create_gaintable_from_visibility(
            vis, jones_type="B", timeslice=1e5
        )
        gt_b = _simulate_gaintable(
            gt_b, rng, phase_error=0.1, amplitude_error=0.05
        )
        corrupted = apply_gaintable(apply_gaintable(vis, gt_t), gt_b)

        controls = create_calibration_controls()
        controls["T"] = dict(controls["T"])
        controls["T"]["shape"] = "matrix"
        controls["T"]["phase_only"] = False
        controls["B"] = dict(controls["B"])
        controls["B"]["first_selfcal"] = 0
        kw = dict(
            nmajor=2, calibration_context="TB", controls=controls,
            context="ng", components=comps, algorithm="hogbom",
            niter=100, gain=0.2, fractional_threshold=0.01,
        )
        d1, r1, s1, g1 = ical(
            corrupted, model, fused=True, use_plan=True, **kw
        )
        d0, r0, s0, g0 = ical(corrupted, model, fused=False, **kw)
        p0 = float(jnp.max(jnp.abs(r0.pixels)))
        p1 = float(jnp.max(jnp.abs(r1.pixels)))
        assert abs(p0 - p1) < 1e-3, (p0, p1)
        for term in "TB":
            # the T*B product carries a scale gauge (only the product is
            # constrained), so compare gains RELATIVE to their magnitude
            ga = np.asarray(g0[term].gain)
            gb = np.asarray(g1[term].gain)
            rel = np.max(np.abs(ga - gb)) / max(np.max(np.abs(ga)), 1.0)
            assert rel < 1e-4, (term, rel)
