"""Gridder accuracy envelope: eps(support, padding) vs the exact DFT
(VERDICT round-2 item 6).

For each (support, padding[, precision]) the plan-path degridder predicts
the visibilities of a handful of point sources at exact pixel centres and
compares them to a host-f64 DFT oracle (max relative vis error). The
invert direction is pinned separately in
tests/test_gridding_accuracy.py (PSF peak position/amplitude).

Run (real TPU): python bench_accuracy.py
     [--nvis 200000] [--npixel 512] [--nw 8] [--quick]
CPU (x64 oracle): JAX_PLATFORMS=cpu ... with --x64 for the f64 envelope.

Prints one JSON line per configuration plus a summary table on stderr.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nvis", type=float, default=200e3)
    ap.add_argument("--npixel", type=int, default=512)
    ap.add_argument("--nw", type=int, default=32)
    ap.add_argument("--x64", action="store_true")
    ap.add_argument(
        "--f64-coords", action="store_true",
        help="keep uvw in f64 through the plan build (needs --x64): "
        "positionally-exact payload taps",
    )
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--supports", default="4,6,8,10,12")
    ap.add_argument("--paddings", default="1.25,1.5,2.0")
    ap.add_argument("--precisions", default="config")
    ap.add_argument(
        "--transform", default="fft", choices=("fft", "matmul"),
        help="image-transform path for the probe (floors use fft)",
    )
    ap.add_argument(
        "--umax-frac", type=float, default=0.33,
        help="uv extent as a fraction of the image band (0.33 = inner "
        "third; 0.49 ~ full usable band)",
    )
    ap.add_argument(
        "--grid-family", default="auto", choices=("auto", "base"),
        help="padded-grid family: 'auto' = 56-family preferred, "
        "'base' = 128-rounded/tile-64 (A/B the shipped geometry)",
    )
    args = ap.parse_args()

    import jax

    if args.x64:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ska_sdp_func_python_tpu.ops.imaging import (
        make_imaging_plan,
        predict_with_plan,
    )
    from ska_sdp_func_python_tpu import config as _cfg

    _cfg.set_grid_family(args.grid_family)

    nvis = int(args.nvis)
    npixel = args.npixel
    cellsize = 5e-5 * 1024 / npixel
    rng = np.random.default_rng(11)
    scale = npixel * cellsize
    umax = args.umax_frac * npixel / scale / 2
    cdt = np.float64 if args.f64_coords else np.float32
    u64 = rng.uniform(-umax, umax, nvis)
    v64 = rng.uniform(-umax, umax, nvis)
    w64 = rng.uniform(-60.0, 60.0, nvis)
    if args.f64_coords and not args.x64:
        # host numpy f64 triggers the plan build's COMPENSATED
        # split-coordinate mode on f32-only devices
        u, v, w = u64, v64, w64
    else:
        u = jnp.asarray(u64.astype(cdt))
        v = jnp.asarray(v64.astype(cdt))
        w = jnp.asarray(w64.astype(cdt))

    # off-grid point sources (pixel-fractional positions exercise the
    # kernel worst case)
    nsrc = 5
    px = rng.uniform(0.2 * npixel, 0.8 * npixel, nsrc)
    py = rng.uniform(0.2 * npixel, 0.8 * npixel, nsrc)
    # snap to pixel centres so the model image holds exact deltas
    px = np.round(px).astype(int)
    py = np.round(py).astype(int)
    flux = rng.uniform(0.5, 2.0, nsrc)
    # plan-path convention (ops.imaging.make_imaging_plan: u_pix uses -u):
    # l = -(x - n/2) cell, m = +(y - n/2) cell, phase -2pi uvw.lmn
    l = -(px - npixel // 2) * cellsize
    m = (py - npixel // 2) * cellsize
    n1 = np.sqrt(1.0 - l**2 - m**2) - 1.0
    lmn = jnp.asarray(np.stack([l, m, n1], -1).astype(np.float32))
    model_px = np.zeros((npixel, npixel), np.float32)
    model_px[py, px] = flux  # [row=y, col=x]
    model_px = jnp.asarray(model_px)

    # exact DFT oracle in host f64 (the measurement floor must sit well
    # below everything measured)
    lmn64 = np.stack(
        [np.asarray(l, np.float64), np.asarray(m, np.float64),
         np.asarray(n1, np.float64)], -1,
    )
    ph = (-2.0 * np.pi) * (
        np.outer(u64, lmn64[:, 0])
        + np.outer(v64, lmn64[:, 1])
        + np.outer(w64, lmn64[:, 2])
    )
    er = np.cos(ph) @ flux
    ei = np.sin(ph) @ flux
    vnorm = float(np.max(np.hypot(er, ei)))

    supports = [int(s) for s in args.supports.split(",")]
    paddings = [float(p) for p in args.paddings.split(",")]
    precisions = args.precisions.split(",")
    if args.quick:
        supports, paddings = [8], [1.25, 2.0]

    rows = []
    for prec in precisions:
        for support in supports:
            for padding in paddings:
                t0 = time.time()
                plan = make_imaging_plan(
                    u, v, w, npixel=npixel, cellsize=cellsize,
                    support=support, nw=args.nw, padding=padding,
                )
                pv = predict_with_plan(
                    plan, model_px,
                    precision=None if prec == "config" else prec,
                    # floors pin the fft transform (what the epsilon
                    # regimes use; the default matmul-HIGH path adds
                    # ~2.5e-5)
                    tail=args.transform,
                )
                pr = np.asarray(jnp.real(pv))
                pi = np.asarray(jnp.imag(pv))
                eps = float(
                    np.max(np.hypot(pr - er, pi - ei)) / vnorm
                )
                dt = time.time() - t0
                row = {
                    "metric": "predict_vs_dft_eps",
                    "support": support,
                    "padding": padding,
                    "precision": prec,
                    "value": eps,
                    "unit": "max rel vis error",
                    "nvis": nvis,
                    "npixel": npixel,
                    "x64": bool(args.x64),
                }
                rows.append(row)
                print(json.dumps(row), flush=True)
                print(
                    f"# support {support:2d} padding {padding:4.2f} "
                    f"prec {prec}: eps {eps:.3e}  ({dt:.0f}s)",
                    file=sys.stderr, flush=True,
                )

    hdr = "support " + "".join(f"{p:>12.2f}" for p in paddings)
    print("#", hdr, file=sys.stderr)
    for s in supports:
        line = f"{s:7d} "
        for p in paddings:
            match = [
                r for r in rows
                if r["support"] == s and r["padding"] == p
            ]
            line += f"{match[0]['value']:>12.2e}" if match else " " * 12
        print("#", line, file=sys.stderr)


if __name__ == "__main__":
    main()
