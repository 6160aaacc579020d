"""Bandpass ("B") end-to-end coverage (VERDICT round-1 item 5).

The contract is chain_calibration.py:137-223: "B" solves a per-channel
gaintable (amplitude+phase) on long timescales, composed after "T"/"G".
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simul import make_visibility
from test_solvers import _simulate_gaintable

from ska_sdp_func_python_tpu.models import (
    SkyComponents,
    create_gaintable_from_visibility,
)
from ska_sdp_func_python_tpu.ops import (
    apply_gaintable,
    create_image_from_visibility,
    dft_skycomponent_visibility,
    solve_gaintable,
)
from ska_sdp_func_python_tpu.ops.calibration_chain import (
    calibrate_chain,
    create_calibration_controls,
)

PC = (0.0, np.deg2rad(-35.0))
NCHAN = 8


def _point_vis(rng, nchan=NCHAN, nants=10, ntimes=4):
    vis = make_visibility(
        nants=nants, ntimes=ntimes, nchan=nchan, rmax=300.0,
        phasecentre=PC,
    )
    comps = SkyComponents.from_lists(
        [[float(vis.phasecentre[0]), float(vis.phasecentre[1])]],
        np.ones((1, nchan, 1)),
        vis.frequency,
    )
    return dft_skycomponent_visibility(vis, comps)


def _ref_phase(g):
    """Phase-reference gains to antenna 0 and normalise the mean
    amplitude (solver gauge freedoms)."""
    g = np.asarray(g)
    g = g * np.exp(-1j * np.angle(g[:, :1]))
    return g / np.mean(np.abs(g))


class TestBandpassSolve:
    def test_recover_per_channel_gains(self, rng):
        """Corrupt with a per-channel B table -> solve -> recover."""
        vis = _point_vis(rng)
        gt_true = create_gaintable_from_visibility(
            vis, jones_type="B", timeslice=1e5
        )
        assert gt_true.gain.shape[2] == NCHAN  # per-channel table
        gt_true = _simulate_gaintable(
            gt_true, rng, phase_error=0.3, amplitude_error=0.15
        )
        corrupted = apply_gaintable(vis, gt_true)
        gt_sol = solve_gaintable(
            corrupted,
            modelvis=vis,
            jones_type="B",
            phase_only=False,
            timeslice=1e5,
            niter=300,
        )
        assert gt_sol.gain.shape[2] == NCHAN
        for chan in range(NCHAN):
            got = _ref_phase(gt_sol.gain[..., chan, 0, 0])
            true = _ref_phase(gt_true.gain[..., chan, 0, 0])
            assert np.max(np.abs(got - true)) < 1e-5, chan

    def test_channels_solved_independently(self, rng):
        """Corrupting one channel must not perturb another channel's
        solution (per-channel normal equations)."""
        vis = _point_vis(rng)
        gt_true = create_gaintable_from_visibility(
            vis, jones_type="B", timeslice=1e5
        )
        gain = np.asarray(gt_true.gain).copy()
        gain[..., 3, 0, 0] *= np.exp(
            1j * rng.normal(0, 0.5, gain.shape[:2])
        )
        corrupted = apply_gaintable(
            vis, gt_true.replace(gain=jnp.asarray(gain))
        )
        gt_sol = solve_gaintable(
            corrupted, modelvis=vis, jones_type="B",
            phase_only=False, timeslice=1e5,
        )
        sol = np.asarray(gt_sol.gain)
        for chan in (0, 1, 2, 4, 7):
            got = _ref_phase(sol[..., chan, 0, 0])
            assert np.max(np.abs(got - 1.0)) < 1e-5, chan
        got3 = _ref_phase(sol[..., 3, 0, 0])
        assert np.max(np.abs(got3 - _ref_phase(gain[..., 3, 0, 0]))) < 1e-5


class TestCalibrateChainTGB:
    def test_tgb_chain_recovers(self, rng):
        """calibrate_chain('TGB') on vis corrupted by T phases, G gains
        and a B ripple: the corrected vis must match the model."""
        vis = _point_vis(rng)
        controls = create_calibration_controls()

        gt_t = create_gaintable_from_visibility(
            vis, jones_type="T", timeslice=controls["T"]["timeslice"]
        )
        gt_t = _simulate_gaintable(gt_t, rng, phase_error=0.2)
        gt_g = create_gaintable_from_visibility(
            vis, jones_type="G", timeslice=controls["G"]["timeslice"]
        )
        gt_g = _simulate_gaintable(
            gt_g, rng, phase_error=0.05, amplitude_error=0.05
        )
        gt_b = create_gaintable_from_visibility(
            vis, jones_type="B", timeslice=controls["B"]["timeslice"]
        )
        gt_b = _simulate_gaintable(
            gt_b, rng, phase_error=0.1, amplitude_error=0.05
        )
        corrupted = vis
        for gt in (gt_t, gt_g, gt_b):
            corrupted = apply_gaintable(corrupted, gt)

        # one chain pass cannot fully separate the degenerate T*G*B
        # product; iterating the chain (as the reference's ICAL loop
        # does, feeding gaintables back) converges it
        gts = None
        for iteration in range(4):
            cvis, gts = calibrate_chain(
                corrupted,
                vis,
                gaintables=gts,
                calibration_context="TGB",
                controls=controls,
                iteration=iteration,
            )
        for term in "TGB":
            assert term in gts, term
        assert gts["B"].gain.shape[2] == NCHAN
        assert gts["T"].gain.shape[2] == 1
        resid0 = np.max(np.abs(np.asarray(corrupted.vis) - np.asarray(vis.vis)))
        resid = np.max(np.abs(np.asarray(cvis.vis) - np.asarray(vis.vis)))
        # sequential peel leaves a small T-leakage floor (T fits one
        # channel-averaged phase per time against the raw vis, so a bit
        # of B's channel-dependent phase leaks into T's per-time error;
        # the reference chain has the same fixed point) — require the
        # misfit collapses by >95% and B recovers the channel STRUCTURE
        assert resid < 0.05 * resid0, (resid, resid0)
        # per-channel bandpass STRUCTURE, fully gauge-free: T/G leak a
        # per-antenna channel-constant factor into B, so compare the
        # channel ratios g_c/g_0 per antenna, each channel then
        # referenced to antenna 0 and mean-amplitude normalised
        b_sol = np.asarray(gts["B"].gain)[..., 0, 0]
        b_true = np.asarray(gt_b.gain)[..., 0, 0]
        r_sol = b_sol / b_sol[..., :1]
        r_true = b_true / b_true[..., :1]
        for chan in range(NCHAN):
            got = _ref_phase(r_sol[..., chan])
            true = _ref_phase(r_true[..., chan])
            assert np.max(np.abs(got - true)) < 2e-3, chan


class TestFusedBandpassICAL:
    @pytest.mark.parametrize("context", ["B", "TB"])
    def test_fused_ical_with_bandpass(self, rng, context):
        """ical with a B term takes the FUSED path and recovers both the
        sky and the per-channel bandpass (cube layout, channel-local
        gains)."""
        from ska_sdp_func_python_tpu.pipeline import ical

        nchan = 4
        vis = make_visibility(
            nants=10, ntimes=3, nchan=nchan, rmax=300.0, phasecentre=PC
        )
        model = create_image_from_visibility(
            vis, npixel=64, oversampling=4.0, nchan=nchan
        )
        ra, dec = model.pixel_to_radec(64 // 2 + 7, 64 // 2 - 5)
        comps = SkyComponents.from_lists(
            [[float(ra), float(dec)]],
            2.0 * np.ones((1, nchan, 1)),
            vis.frequency,
        )
        vis = dft_skycomponent_visibility(vis, comps)
        gt_true = create_gaintable_from_visibility(
            vis, jones_type="B", timeslice=1e5
        )
        gt_true = _simulate_gaintable(
            gt_true, rng, phase_error=0.25, amplitude_error=0.1
        )
        corrupted = apply_gaintable(vis, gt_true)
        current, residual, restored, gts = ical(
            corrupted,
            model,
            nmajor=4,
            calibration_context=context,
            context="ng",
            algorithm="hogbom",
            niter=300,
            gain=0.2,
            fractional_threshold=0.01,
            use_plan=True,
            fused=True,
        )
        assert "B" in gts
        assert gts["B"].gain.shape[2] == nchan
        res_peak = float(jnp.max(jnp.abs(residual.pixels)))
        assert res_peak < 0.25, res_peak
        peak = float(jnp.max(restored.pixels))
        assert abs(peak - 2.0) < 0.3, peak
        # bandpass close to the injected one (limited by the recovered
        # sky model per channel, not by the solver)
        for chan in range(nchan):
            got = _ref_phase(gts["B"].gain[..., chan, 0, 0])
            true = _ref_phase(gt_true.gain[..., chan, 0, 0])
            # sanity only — the strong check is fused == composed below
            assert np.max(np.abs(got - true)) < 0.5, chan
        # exactness oracle: the fused cycle must match the composed
        # (unfused) ICAL running the same algorithm
        c0, r0, s0, g0 = ical(
            corrupted,
            model,
            nmajor=4,
            calibration_context=context,
            context="ng",
            algorithm="hogbom",
            niter=300,
            gain=0.2,
            fractional_threshold=0.01,
            use_plan=True,
            fused=False,
        )
        for chan in range(nchan):
            ga = _ref_phase(gts["B"].gain[..., chan, 0, 0])
            gb = _ref_phase(g0["B"].gain[..., chan, 0, 0])
            assert np.max(np.abs(ga - gb)) < 2e-2, chan
        assert (
            abs(float(jnp.max(jnp.abs(r0.pixels))) - res_peak) < 2e-2
        )
