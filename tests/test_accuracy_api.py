"""Epsilon-driven gridder parameter selection (VERDICT round-3 item 3).

The reference's gridder takes ``epsilon`` and picks its own parameters
(imaging/ng.py:59 ``epsilon=1e-12``, ng.py:254 double-precision switch);
here :mod:`ska_sdp_func_python_tpu.ops.accuracy` maps a requested
tolerance onto the measured accuracy envelope and
``invert_visibility`` / ``predict_visibility`` accept ``epsilon=``.
End-to-end checks drive the public API against an exact DFT oracle.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from ska_sdp_func_python_tpu.models import SkyComponents
from ska_sdp_func_python_tpu.ops import (
    create_image_from_visibility,
    invert_visibility,
    predict_visibility,
)
from ska_sdp_func_python_tpu.ops.accuracy import (
    gridding_params_for_epsilon,
    nw_for_epsilon,
)
from ska_sdp_func_python_tpu.ops.dft import dft_skycomponent_visibility
from ska_sdp_func_python_tpu.utils.coordinates import skycoord_to_lmn

from simul import make_visibility

PC = (0.0, np.deg2rad(-35.0))
NPIX = 128


class TestResolver:
    def test_ladder_monotone(self):
        """Tighter epsilon never selects a cheaper configuration and
        the regime floor always fits half the budget."""
        prev = None
        for eps in (1e-3, 1e-4, 1e-5, 3e-6, 1e-6, 3e-7, 1e-7, 6e-8):
            acc = gridding_params_for_epsilon(eps)
            assert acc.floor_eps <= eps / 2, (eps, acc)
            if prev is not None:
                assert acc.support >= prev.support
                assert nw_for_epsilon(8, eps) >= nw_for_epsilon(
                    8, prev.epsilon
                )
            prev = acc

    def test_nw_scaling(self):
        """nw scales as 1/sqrt(eps) from the heuristic estimate and
        never shrinks below it."""
        assert nw_for_epsilon(8, 1e-1) == 8
        n1 = nw_for_epsilon(8, 1e-6)
        n2 = nw_for_epsilon(8, 4e-6)
        assert abs(n1 - 2 * n2) <= 2, (n1, n2)
        assert nw_for_epsilon(16, 1e-6) > nw_for_epsilon(8, 1e-6)

    def test_regime_selection(self):
        # floors are EDGE-SOURCE honest (round 5): fast-f32 is
        # aliasing-dominated at the field edge (3e-4), so 1e-4 already
        # needs the compensated row
        assert gridding_params_for_epsilon(1e-3).regime == "fast-f32"
        assert (
            gridding_params_for_epsilon(1e-4).regime == "compensated-f32"
        )
        assert (
            gridding_params_for_epsilon(1e-5).regime == "precise-f32"
        )
        acc = gridding_params_for_epsilon(1e-7)
        assert acc.gridder == "tiled" and acc.requires_x64
        assert gridding_params_for_epsilon(5e-8).support >= 8

    def test_2d_full_budget_to_floor(self):
        acc = gridding_params_for_epsilon(5e-6, do_wstacking=False)
        assert acc.regime in ("compensated-f32", "precise-f32")

    def test_deep_regime_resolves_eskernel(self):
        """All w-stacked regimes use ES-kernel w-gridding (round 5):
        the polynomial nw laws under-delivered >100x for edge sources
        (the kernel bounds the w error uniformly over the field)."""
        from ska_sdp_func_python_tpu.ops.accuracy import (
            gridding_params_for_epsilon,
        )

        acc = gridding_params_for_epsilon(1e-11)
        assert acc.w_interp == "eskernel"
        assert acc.regime == "deep-f64-s16"
        for eps in (5e-5, 1e-6, 1e-8):
            assert (
                gridding_params_for_epsilon(eps).w_interp == "eskernel"
            )

    def test_infeasible_raises(self):
        with pytest.raises(ValueError, match="below the validated"):
            gridding_params_for_epsilon(1e-12)
        with pytest.raises(ValueError, match="positive"):
            gridding_params_for_epsilon(0.0)

    def test_f32_floor_raises_without_x64(self):
        """Below ~2e-6 without x64 the resolver must refuse (the fused
        f32 path cannot deliver it) and point at x64."""
        try:
            jax.config.update("jax_enable_x64", False)
            with pytest.raises(ValueError, match="f32 device floor"):
                gridding_params_for_epsilon(1e-7)
            # the f32 ladder itself still resolves (chip-honest bottom:
            # epsilon=1e-5 via the precise row, delivered 6.8e-6 at the
            # field edge on one v5e)
            assert gridding_params_for_epsilon(1e-5).regime in (
                "compensated-f32", "precise-f32",
            )
        finally:
            jax.config.update("jax_enable_x64", True)


class TestEndToEnd:
    def _setup(self):
        vis = make_visibility(
            nants=10, ntimes=3, nchan=1, rmax=300.0, phasecentre=PC
        )
        model = create_image_from_visibility(
            vis, npixel=NPIX, oversampling=4.0, nchan=1
        )
        ra, dec = model.pixel_to_radec(NPIX // 2 + 12, NPIX // 2 + 9)
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]],
            np.ones((1, 1, 1)),
            model.frequency,
        )
        vis_dft = dft_skycomponent_visibility(vis, comps)
        pixels = jnp.zeros_like(model.pixels)
        pixels = pixels.at[0, 0, NPIX // 2 + 9, NPIX // 2 + 12].set(1.0)
        return vis, vis_dft, model.with_pixels(pixels)

    @pytest.mark.parametrize("eps", [5e-5, 1e-6, 5e-8, 1e-11])
    def test_predict_meets_epsilon(self, eps):
        """predict_visibility(epsilon=eps) vs the exact DFT delivers
        the requested tolerance (CPU x64 oracle; the chip-side check of
        the f32 regimes is bench_accuracy.py)."""
        vis, vis_dft, model_img = self._setup()
        got = predict_visibility(
            vis, model_img, context="ng", epsilon=eps
        )
        err = np.max(
            np.abs(np.asarray(got.vis) - np.asarray(vis_dft.vis))
        )
        assert err < eps, (eps, err)

    def test_invert_epsilon_runs_and_recovers(self):
        """invert_visibility(epsilon=) recovers the point source."""
        vis, vis_dft, model_img = self._setup()
        dirty, _ = invert_visibility(
            vis_dft, model_img, context="ng", epsilon=1e-6
        )
        img = np.asarray(dirty.pixels)[0, 0]
        iy, ix = np.unravel_index(np.argmax(img), img.shape)
        assert (ix, iy) == (NPIX // 2 + 12, NPIX // 2 + 9)
        assert abs(img[iy, ix] - 1.0) < 1e-3, img[iy, ix]


class TestGridFamilyKnob:
    """config.set_grid_family pins the padded-grid geometry family."""

    def test_geometry_table(self):
        from ska_sdp_func_python_tpu import config
        from ska_sdp_func_python_tpu.ops.imaging import _npad_for, _tile_for

        try:
            config.set_grid_family("base")
            assert _npad_for(1024, 1.25) == 1280
            assert _tile_for(_npad_for(1024, 1.25)) == 64
            config.set_grid_family("auto")
            assert _npad_for(1024, 1.25) == 1344
            assert _tile_for(_npad_for(1024, 1.25)) == 56
            # 56-family never shrinks below the 128-rounded base
            for npix in (128, 256, 512, 1024):
                assert _npad_for(npix, 1.25) >= -(-int(npix * 1.25) // 128) * 128
        finally:
            config.set_grid_family("auto")

    def test_rejects_unknown(self):
        from ska_sdp_func_python_tpu import config

        with pytest.raises(ValueError):
            config.set_grid_family("bogus")


class TestAstrometryContract:
    """Directions/phase centres are host-f64 metadata: an absolute
    direction error of eps32 (~1e-8 rad) costs 2*pi*|uvw|*eps of
    visibility phase (~1e-3 at 2465-wavelength baselines, measured on
    chip), so astrometric math must never run through device f32.
    Reproduces the round-4 bug with x64 disabled (the TPU regime)."""

    def test_f64_storage_and_roundtrip(self):
        try:
            jax.config.update("jax_enable_x64", False)
            vis = make_visibility(nants=10, ntimes=2, nchan=1, rmax=300.0)
            assert isinstance(vis.phasecentre, np.ndarray)
            assert vis.phasecentre.dtype == np.float64
            model = create_image_from_visibility(
                vis, npixel=256, oversampling=4.0, nchan=1
            )
            assert isinstance(model.phasecentre, np.ndarray)
            cell = float(model.cellsize)
            ra, dec = model.pixel_to_radec(128 + 12, 128 + 9)
            l, m, _ = skycoord_to_lmn(
                np.asarray([float(ra), float(dec)]),
                np.asarray(vis.phasecentre, np.float64),
            )
            # pixel -> radec -> lmn roundtrip exact to f64 (was 1.1e-8
            # through device f32 = 1.8e-4 phase at 2465 wavelengths)
            assert abs(float(l) - (-12 * cell)) < 1e-13
            assert abs(float(m) - 9 * cell) < 1e-13
        finally:
            jax.config.update("jax_enable_x64", True)

    def test_dft_long_baseline_phase(self):
        """DFT vis phase error vs a host-f64 oracle stays ~1e-6 with an
        f32 device (was 8.5e-4 when lmn went through device trig)."""
        try:
            jax.config.update("jax_enable_x64", False)
            vis = make_visibility(nants=24, ntimes=4, nchan=1, rmax=2000.0)
            model = create_image_from_visibility(
                vis, npixel=256, oversampling=4.0, nchan=1
            )
            ra, dec = model.pixel_to_radec(128 + 12, 128 + 9)
            comps = SkyComponents.from_lists(
                [[float(ra), float(dec)]], np.ones((1, 1, 1)),
                model.frequency,
            )
            got = dft_skycomponent_visibility(vis, comps)
            uvw_l = np.asarray(vis.uvw, np.float64) * (
                float(np.asarray(vis.frequency)[0]) / 299792458.0
            )
            l, m, n1 = [float(x) for x in skycoord_to_lmn(
                np.asarray([float(ra), float(dec)]),
                np.asarray(vis.phasecentre, np.float64),
            )]
            ph = -2 * np.pi * (
                uvw_l[..., 0] * l + uvw_l[..., 1] * m + uvw_l[..., 2] * n1
            )
            truth = np.exp(1j * ph)[..., None, None]
            err = float(np.max(np.abs(np.asarray(got.vis) - truth)))
            assert err < 3e-6, err
        finally:
            jax.config.update("jax_enable_x64", True)


    def test_dft_ska_scale_baselines(self):
        """Split-(hi,lo) lmn keeps DFT phase accurate at 2.5e5-wavelength
        baselines on an f32 device (bare f32 lmn would cost ~1e-4)."""
        try:
            jax.config.update("jax_enable_x64", False)
            vis = make_visibility(nants=16, ntimes=2, nchan=1, rmax=30000.0)
            vis = vis.replace(frequency=np.asarray([1.4e9]))
            model = create_image_from_visibility(
                vis, npixel=256, oversampling=3.0, nchan=1
            )
            ra, dec = model.pixel_to_radec(128 + 40, 128 + 25)
            comps = SkyComponents.from_lists(
                [[float(ra), float(dec)]], np.ones((1, 1, 1)),
                model.frequency,
            )
            got = dft_skycomponent_visibility(vis, comps)
            uvw_l = np.asarray(vis.uvw, np.float64) * (
                1.4e9 / 299792458.0
            )
            l, m, n1 = [float(x) for x in skycoord_to_lmn(
                np.asarray([float(ra), float(dec)]),
                np.asarray(vis.phasecentre, np.float64),
            )]
            ph = -2 * np.pi * (
                uvw_l[..., 0] * l + uvw_l[..., 1] * m + uvw_l[..., 2] * n1
            )
            truth = np.exp(1j * ph)[..., None, None]
            err = float(np.max(np.abs(np.asarray(got.vis) - truth)))
            assert err < 1e-5, err
        finally:
            jax.config.update("jax_enable_x64", True)


class TestAdversarialEpsilon:
    """Hardness test for the epsilon contract (VERDICT r4 item 9): a
    wide-field, large-wmax LOW-core config with the source near the
    image EDGE, where the retired polynomial w-interpolation laws
    under-delivered by >100x at every ladder row (the w-phase curvature
    (n-1) ~ r^2/2 grows 4th-power toward the edge; the Cornwell nw
    heuristic is calibrated for benign positions). The ES-kernel
    w-gridding regimes must deliver requested epsilon field-wide.
    Reference contract: imaging/ng.py:59 (epsilon applies to the whole
    image, default production backend)."""

    def _setup(self):
        vis = make_visibility(
            nants=16, ntimes=5, nchan=1, rmax=2000.0, phasecentre=PC,
            times=np.linspace(-np.pi / 4, np.pi / 4, 5),
        )
        npix = 256
        model = create_image_from_visibility(
            vis, npixel=npix, oversampling=2.0, nchan=1
        )
        # assert the case really is adversarial: nw_est >> 1
        uvw = np.asarray(vis.uvw) * (
            float(np.max(np.asarray(vis.frequency))) / 299792458.0
        )
        wmax = float(np.abs(uvw[..., 2]).max())
        fov = npix * float(model.cellsize)
        assert 4.0 * wmax * fov * fov > 8.0
        ra, dec = model.pixel_to_radec(npix // 2 + 90, npix // 2 + 70)
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]], np.ones((1, 1, 1)),
            model.frequency,
        )
        vis_dft = dft_skycomponent_visibility(vis, comps)
        px = jnp.zeros_like(model.pixels)
        px = px.at[0, 0, npix // 2 + 70, npix // 2 + 90].set(1.0)
        return vis, vis_dft, model.with_pixels(px)

    @pytest.mark.parametrize("eps", [1e-5, 1e-7, 1e-9, 1e-11])
    def test_edge_source_delivers(self, eps):
        vis, vis_dft, mimg = self._setup()
        got = predict_visibility(vis, mimg, context="ng", epsilon=eps)
        err = np.max(
            np.abs(np.asarray(got.vis) - np.asarray(vis_dft.vis))
        )
        assert err < eps, (eps, err)

    def test_invert_edge_recovers(self):
        vis, vis_dft, mimg = self._setup()
        npix = 256
        dirty, _ = invert_visibility(
            vis_dft, mimg, context="ng", epsilon=1e-7
        )
        img = np.asarray(dirty.pixels)[0, 0]
        iy, ix = np.unravel_index(np.argmax(img), img.shape)
        assert (ix, iy) == (npix // 2 + 90, npix // 2 + 70)

    def test_edge_source_plan_path(self):
        """The f32 epsilon rows ride the eskernel PLAN path (fused
        gridder, ES pair weights folded into the taps) when a plan is
        available — same field-uniform accuracy as the tiled core route
        (round 5). Forced on here (auto_plan defaults off on CPU)."""
        vis, vis_dft, mimg = self._setup()
        got = predict_visibility(
            vis, mimg, context="ng", epsilon=1e-5, auto_plan=True
        )
        err = np.max(
            np.abs(np.asarray(got.vis) - np.asarray(vis_dft.vis))
        )
        assert err < 1e-5, err
        # second call on the same coordinates rides the plan cache
        got2 = predict_visibility(
            vis, mimg, context="ng", epsilon=1e-5, auto_plan=True
        )
        assert np.array_equal(
            np.asarray(got2.vis), np.asarray(got.vis)
        )
        # invert through the same plan recovers the edge source
        npix = 256
        dirty, _ = invert_visibility(
            vis_dft, mimg, context="ng", epsilon=1e-5, auto_plan=True
        )
        img = np.asarray(dirty.pixels)[0, 0]
        iy, ix = np.unravel_index(np.argmax(img), img.shape)
        assert (ix, iy) == (npix // 2 + 90, npix // 2 + 70)
