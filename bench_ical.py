"""End-to-end self-cal (ICAL) benchmark on the real TPU.

BASELINE.md config 5 scaled to one chip: simulate a LOW snapshot on
device, corrupt with per-station phase errors, run the fused one-dispatch
major cycle (pipeline._fused_selfcal_cycle) and report the steady-state
major-cycle rate. Each cycle = predict (fused degrid) + StefCal solve +
gain apply + residual invert (fused grid) + Hogbom minor cycles, all in a
single compiled program.

Usage: python bench_ical.py [--ntimes 16] [--npixel 512] [--rmax 1500]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rmax", type=float, default=1500.0)
    ap.add_argument("--ntimes", type=int, default=16)
    ap.add_argument("--npixel", type=int, default=512)
    ap.add_argument("--warm", type=int, default=3)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--nw", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ska_sdp_func_python_tpu.config import expi
    from ska_sdp_func_python_tpu.models import (
        SkyComponents,
        create_gaintable_from_visibility,
        create_named_configuration,
        create_visibility,
    )
    from ska_sdp_func_python_tpu.ops import (
        apply_gaintable,
        create_image_from_visibility,
        dft_skycomponent_visibility,
        weight_visibility,
    )
    from ska_sdp_func_python_tpu.ops.imaging import (
        invert_visibility,
        make_visibility_plan,
    )
    from ska_sdp_func_python_tpu.pipeline import (
        _FusedSelfCal,
        _fused_selfcal_cycle,
        create_calibration_controls,
    )

    rng = np.random.default_rng(42)
    cfg = create_named_configuration("LOW", rmax=args.rmax)
    vis = create_visibility(
        cfg,
        np.linspace(-0.3, 0.3, args.ntimes),
        [1.2e8],
        elevation_limit=np.deg2rad(15.0),
    )
    nvis = vis.ntimes * vis.nbaselines
    print(
        f"# {cfg.nants} stations, {nvis/1e6:.2f}M vis, "
        f"{args.npixel}^2 image",
        file=sys.stderr,
    )
    model = create_image_from_visibility(
        vis, npixel=args.npixel, oversampling=3.0, nchan=1
    )
    npx = args.npixel
    dirs, fluxes = [], []
    for dx, dy, f in [(0, 0, 2.0), (60, -40, 1.2), (-80, 30, 0.8)]:
        ra, dec = model.pixel_to_radec(npx // 2 + dx, npx // 2 + dy)
        dirs.append([float(ra), float(dec)])
        fluxes.append([[f]])
    sky = SkyComponents.from_lists(dirs, np.asarray(fluxes), vis.frequency)
    vis = dft_skycomponent_visibility(vis, sky)
    gt_true = create_gaintable_from_visibility(vis, jones_type="T")
    phases = rng.normal(0, 0.4, gt_true.gain.shape[:3])
    gt_true = gt_true.replace(
        gain=jnp.broadcast_to(
            expi(jnp.asarray(phases))[..., None, None], gt_true.gain.shape
        )
    )
    corrupted = apply_gaintable(vis, gt_true)
    corrupted = weight_visibility(corrupted, model, weighting="uniform")

    plan = make_visibility_plan(
        corrupted, model, context="ng", nw=args.nw
    )
    psf, _ = invert_visibility(
        corrupted, model, dopsf=True, context="ng", plan=plan
    )
    controls = create_calibration_controls()
    ws = _FusedSelfCal(
        corrupted,
        model,
        plan,
        sky,
        ["T"],
        controls,
        "mean",
        200,
        1e-6,
        psf,
        algorithm="hogbom",
        niter=300,
        gain=0.2,
        fractional_threshold=0.01,
    )
    gain = (ws.gt0s[0].gain,)
    st = ws.state((ws.gt0s[0].weight,), (ws.gt0s[0].residual,))
    model_px = jnp.zeros_like(model.pixels).astype(jnp.float32)

    def cycle(mp, g):
        mp, g, _, _, _, _, peak = _fused_selfcal_cycle(
            st, mp, g, cfg=ws.cfg, do_cal=(True,), with_model=True
        )
        return mp, g, peak

    for _ in range(args.warm):
        model_px, gain, peak = cycle(model_px, gain)
    float(np.asarray(peak))
    best = 1e9
    for _ in range(args.reps):
        t0 = time.perf_counter()
        model_px, gain, peak = cycle(model_px, gain)
        float(np.asarray(peak))  # force the d2h fetch (see CLAUDE.md)
        best = min(best, time.perf_counter() - t0)
    rate = 1.0 / best
    print(
        f"# steady-state fused self-cal major cycle: {best*1e3:.1f} ms "
        f"({nvis/best/1e6:.1f} Mvis/s through the full cycle); "
        f"residual peak {float(np.asarray(peak)):.2e}",
        file=sys.stderr,
    )
    import json

    from ska_sdp_func_python_tpu.ops.imaging import _npad_for
    from ska_sdp_func_python_tpu.utils.roofline import (
        fused_cycle_model, roofline,
    )

    model_r = fused_cycle_model(
        nvis, args.npixel, _npad_for(args.npixel, 1.25),
        cfg.nants, args.ntimes, nw=args.nw or 8,
    )
    print(json.dumps({
        "metric": "ical_major_cycles_per_s", "value": round(rate, 2),
        "unit": "cycles/s", "nvis": nvis, "npixel": args.npixel,
        **roofline(model_r, best),
    }))


if __name__ == "__main__":
    main()
