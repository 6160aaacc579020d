"""MSMFS continuum pipeline benchmark (BASELINE config 4: multi-scale
multi-frequency CLEAN major/minor cycles, 64 channels batched).

One channel-batched fused major cycle (pipeline._fused_selfcal_cycle_cube):
vmapped per-channel degrid + residual + Pallas grid + FFT tail over the
channel-stacked plans, then in-graph moment transform + msmfsclean.

Usage: python bench_msmfs_pipeline.py [--nchan 64] [--npixel 256]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nchan", type=int, default=64)
    ap.add_argument("--npixel", type=int, default=256)
    ap.add_argument("--nants", type=int, default=256)
    ap.add_argument("--ntimes", type=int, default=9)
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "./tests")
    from simul import make_visibility

    from ska_sdp_func_python_tpu.models import SkyComponents
    from ska_sdp_func_python_tpu.ops import (
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
        _fused_selfcal_cycle_cube,
        create_calibration_controls,
    )

    nchan = args.nchan
    vis = make_visibility(
        nants=args.nants,
        ntimes=args.ntimes,
        nchan=nchan,
        frequency0=1.0e8,
        channel_bandwidth=1e6,
        rmax=2000.0,
    )
    nvis = vis.ntimes * vis.nbaselines * nchan
    print(
        f"# {args.nants} ants, {nchan} chan, {nvis/1e6:.1f}M vis, "
        f"{args.npixel}^2 cube",
        file=sys.stderr,
    )
    model = create_image_from_visibility(
        vis, npixel=args.npixel, oversampling=3.0, nchan=nchan
    )
    ra, dec = model.pixel_to_radec(
        args.npixel // 2 + 20, args.npixel // 2 - 14
    )
    f0 = np.asarray(vis.frequency)
    flux = (2.0 * (f0 / f0[nchan // 2]) ** -0.7)[None, :, None]
    sky = SkyComponents.from_lists(
        [[float(ra), float(dec)]], flux, vis.frequency
    )
    vis = dft_skycomponent_visibility(vis, sky)
    vis = weight_visibility(vis, model, weighting="uniform")

    plan = make_visibility_plan(vis, model, context="ng")
    psf, _ = invert_visibility(
        vis, model, dopsf=True, context="ng", plan=plan
    )
    ws = _FusedSelfCal(
        vis,
        model,
        plan,
        None,
        ["T"],
        create_calibration_controls(),
        None,
        1,
        1e-6,
        psf,
        algorithm="mmclean",
        nmoment=3,
        niter=100,
        fractional_threshold=0.01,
    )
    st = ws.state((ws.gt0s[0].weight,), (ws.gt0s[0].residual,))
    gains = (ws.gt0s[0].gain,)
    model_px = jnp.zeros_like(model.pixels).astype(jnp.float32)

    def cycle(mp):
        mp, _, _, _, _, _, peak = _fused_selfcal_cycle_cube(
            st, mp, gains, cfg=ws.cfg, do_cal=(False,), with_model=True
        )
        return mp, peak

    t0 = time.perf_counter()
    model_px, peak = cycle(model_px)
    float(np.asarray(peak))
    print(
        f"# compile+first cycle: {time.perf_counter()-t0:.1f}s",
        file=sys.stderr,
    )
    for _ in range(args.warm - 1):
        model_px, peak = cycle(model_px)
    float(np.asarray(peak))
    best = 1e9
    for _ in range(args.reps):
        t0 = time.perf_counter()
        model_px, peak = cycle(model_px)
        float(np.asarray(peak))
        best = min(best, time.perf_counter() - t0)
    print(
        f"# steady-state MSMFS major cycle ({nchan} chan batched): "
        f"{best*1e3:.1f} ms; residual peak {float(np.asarray(peak)):.3e}",
        file=sys.stderr,
    )
    print(
        '{"metric": "msmfs_major_cycles_per_s", '
        f'"value": {1.0/best:.2f}, "unit": "cycles/s", '
        f'"nchan": {nchan}, "nvis": {nvis}, "npixel": {args.npixel}}}'
    )


if __name__ == "__main__":
    main()
