"""Split the fused self-cal major cycle into legs by compiling gated
variants (each timed steady-state, K reps per fetch amortising the
~30 ms tunnel dispatch):

  full        do_cal=True,  with_model=True   (the production cycle)
  nocal       do_cal=False, with_model=True   (no solve/apply/factor-sort)
  nomodel     do_cal=False, with_model=False  (invert+clean only)

full - nocal   = calibration leg (unsort + normal eqs + StefCal +
                 factor sort + apply)
nocal - nomodel= predict leg (degrid + model subtract)

Usage: python bench_cycle_split.py [--ntimes 267] [--npixel 1024] [--nw 8]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rmax", type=float, default=1500.0)
    ap.add_argument("--ntimes", type=int, default=267)
    ap.add_argument("--npixel", type=int, default=1024)
    ap.add_argument("--nw", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
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
    print(f"# {cfg.nants} stations, {nvis/1e6:.2f}M vis", file=sys.stderr)
    model = create_image_from_visibility(
        vis, npixel=args.npixel, oversampling=3.0, nchan=1
    )
    npx = args.npixel
    ra, dec = model.pixel_to_radec(npx // 2, npx // 2)
    sky = SkyComponents.from_lists(
        [[float(ra), float(dec)]], [[[2.0]]], vis.frequency
    )
    vis = dft_skycomponent_visibility(vis, sky)
    gt_true = create_gaintable_from_visibility(vis, jones_type="T")
    phases = rng.normal(0, 0.4, gt_true.gain.shape[:3])
    gt_true = gt_true.replace(
        gain=jnp.broadcast_to(
            expi(jnp.asarray(phases))[..., None, None],
            gt_true.gain.shape,
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
    ws = _FusedSelfCal(
        corrupted, model, plan, sky, ["T"],
        create_calibration_controls(), "mean", 200, 1e-6, psf,
        algorithm="hogbom", niter=300, gain=0.2,
        fractional_threshold=0.01,
    )
    gain = (ws.gt0s[0].gain,)
    st = ws.state((ws.gt0s[0].weight,), (ws.gt0s[0].residual,))
    model_px = jnp.zeros_like(model.pixels).astype(jnp.float32)

    times = {}
    for tag, do_cal, with_model in (
        ("nomodel", (False,), False),
        ("nocal", (False,), True),
        ("full", (True,), True),
    ):
        def cyc(mp, g):
            out = _fused_selfcal_cycle(
                st, mp, g, cfg=ws.cfg, do_cal=do_cal,
                with_model=with_model,
            )
            return out[0], out[1], out[6]

        mp, g = model_px, gain
        t0 = time.time()
        mp, g, peak = cyc(mp, g)
        float(np.asarray(peak))
        print(f"{tag}: compile+first {time.time()-t0:.0f}s", flush=True)
        best = 1e9
        for _ in range(args.reps):
            t0 = time.time()
            mp2, g2, peak = cyc(mp, g)
            float(np.asarray(peak))
            best = min(best, time.time() - t0)
        times[tag] = best
        print(f"{tag}: {best*1e3:.1f} ms", flush=True)
    print(
        f"calibration leg: {(times['full']-times['nocal'])*1e3:.1f} ms; "
        f"predict leg: {(times['nocal']-times['nomodel'])*1e3:.1f} ms; "
        f"invert+clean(+dispatch): {times['nomodel']*1e3:.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
