"""End-to-end self-calibration demo on the accelerator.

Simulates an SKA-LOW-like snapshot on device (all data stays on the chip —
the axon tunnel cannot move complex arrays), corrupts it with per-station
phase errors, then runs the full ICAL loop (pipeline.ical): predict ->
StefCal solve -> correct -> w-stacked invert -> Hogbom clean -> restore,
and reports recovered flux, gain-phase error and timings.

Run: python examples/selfcal_tpu_demo.py [--ntimes 16] [--npixel 512]
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
    ap.add_argument("--nmajor", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ska_sdp_func_python_tpu.models import (
        SkyComponents,
        create_named_configuration,
        create_visibility,
        create_gaintable_from_visibility,
    )
    from ska_sdp_func_python_tpu.ops import (
        apply_gaintable,
        create_image_from_visibility,
        dft_skycomponent_visibility,
        weight_visibility,
    )
    from ska_sdp_func_python_tpu.config import expi
    from ska_sdp_func_python_tpu.pipeline import ical
    from ska_sdp_func_python_tpu.utils import qa_image

    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(42)

    t0 = time.time()
    cfg = create_named_configuration("LOW", rmax=args.rmax)
    vis = create_visibility(
        cfg,
        np.linspace(-0.3, 0.3, args.ntimes),
        [1.2e8],
        elevation_limit=np.deg2rad(15.0),
    )
    nvis = vis.ntimes * vis.nbaselines
    print(
        f"observation: {cfg.nants} stations, {vis.ntimes} times, "
        f"{nvis/1e3:.1f}k visibilities"
    )
    model = create_image_from_visibility(
        vis, npixel=args.npixel, oversampling=3.0, nchan=1
    )

    # true sky: 5 point sources
    npx = args.npixel
    dirs, fluxes = [], []
    for dx, dy, f in [
        (0, 0, 2.0),
        (60, -40, 1.2),
        (-80, 30, 0.8),
        (30, 90, 0.6),
        (-50, -70, 0.4),
    ]:
        ra, dec = model.pixel_to_radec(npx // 2 + dx, npx // 2 + dy)
        dirs.append([float(ra), float(dec)])
        fluxes.append([[f]])
    sky = SkyComponents.from_lists(dirs, np.asarray(fluxes), vis.frequency)
    vis = dft_skycomponent_visibility(vis, sky)

    # corrupt with per-station phase errors (0.4 rad rms)
    gt_true = create_gaintable_from_visibility(vis, jones_type="T")
    phases = rng.normal(0, 0.4, gt_true.gain.shape[:3])
    # build the complex gains on device (axon cannot transfer complex)
    gt_true = gt_true.replace(
        gain=jnp.broadcast_to(
            expi(jnp.asarray(phases))[..., None, None], gt_true.gain.shape
        )
    )
    corrupted = apply_gaintable(vis, gt_true)
    # uniform weighting: the naturally-weighted PSF of a core-dominated
    # array is a broad plateau on which Hogbom CLEAN legitimately diverges
    # (verified identical against the reference numpy cleaner)
    corrupted = weight_visibility(corrupted, model, weighting="uniform")
    print(f"setup: {time.time()-t0:.1f} s")

    t1 = time.time()
    deconvolved, residual, restored, gts = ical(
        corrupted,
        model,
        components=sky,
        nmajor=args.nmajor,
        calibration_context="T",
        context="ng",
        algorithm="hogbom",
        niter=300,
        gain=0.2,
        fractional_threshold=0.01,
    )
    print(f"ical ({args.nmajor} major cycles): {time.time()-t1:.1f} s")

    img = np.asarray(restored.pixels)[0, 0]
    qa = qa_image(restored, "restored")
    print(f"peak residual: {float(jnp.max(jnp.abs(residual.pixels))):.4f}")
    print(f"restored peak: {img.max():.3f} Jy/beam (truth 2.0)")
    print(f"restored median abs: {qa['medianabs']:.5f}")

    gt = gts["T"]
    # fetch complex gains as (real, imag) f32 pairs: the axon tunnel has no
    # complex d2h transfer
    def fetch_c(x):
        return np.asarray(jnp.real(x)) + 1j * np.asarray(jnp.imag(x))

    gs = fetch_c(gt.gain)[..., 0, 0]
    gtr = fetch_c(gt_true.gain)[..., 0, 0]
    rel = np.angle(gs * np.conj(gs[:, :1])) - np.angle(
        gtr * np.conj(gtr[:, :1])
    )
    err = np.abs(np.angle(np.exp(1j * rel))).max()
    print(f"max gain-phase error (ref-ant relative): {err:.2e} rad")


if __name__ == "__main__":
    main()
