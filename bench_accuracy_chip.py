"""On-chip epsilon-contract check: predict/invert_visibility(epsilon=)
through the PUBLIC API on the real TPU, EDGE source, vs an exact
host-f64 DFT oracle (VERDICT r4 items 3/9 chip leg).

The f32 ladder rows now route through the compensated (hi, lo) pixel
coordinates + ES-kernel w-gridding tiled path; this measures what they
actually deliver on the device (the CPU x64 tests cannot see f32 tap
storage or on-chip matmul behaviour).

Run: python bench_accuracy_chip.py  (axon tunnel; ~5 min of compiles)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    import jax
    import jax.numpy as jnp

    from simul import make_visibility
    from ska_sdp_func_python_tpu.models import SkyComponents
    from ska_sdp_func_python_tpu.ops import (
        create_image_from_visibility,
        invert_visibility,
        predict_visibility,
    )

    PC = (0.0, np.deg2rad(-35.0))
    vis = make_visibility(
        nants=24, ntimes=8, nchan=1, rmax=2000.0, phasecentre=PC,
        times=np.linspace(-np.pi / 4, np.pi / 4, 8),
    )
    npix = 512
    model = create_image_from_visibility(
        vis, npixel=npix, oversampling=2.0, nchan=1
    )
    dx, dy = 180, 140  # ~70% of the half-field: the adversarial case
    ra, dec = model.pixel_to_radec(npix // 2 + dx, npix // 2 + dy)
    comps = SkyComponents.from_lists(
        [[float(ra), float(dec)]], np.ones((1, 1, 1)), model.frequency
    )
    px = jnp.zeros_like(model.pixels)
    px = px.at[0, 0, npix // 2 + dy, npix // 2 + dx].set(1.0)
    mimg = model.with_pixels(px)

    # exact host-f64 DFT oracle (sign conventions verified on CPU vs the
    # w=0 gridder in round 5)
    uvw = np.asarray(vis.uvw, np.float64)
    f = float(np.asarray(vis.frequency)[0]) / 299792458.0
    uu = (uvw[..., 0] * f).reshape(-1)
    vv = (uvw[..., 1] * f).reshape(-1)
    ww = (uvw[..., 2] * f).reshape(-1)
    cell = float(model.cellsize)
    l0, m0 = -dx * cell, dy * cell
    nrm = np.sqrt(1.0 - l0 * l0 - m0 * m0)
    oracle = np.exp(
        -2j * np.pi * (uu * l0 + vv * m0 + ww * (nrm - 1.0))
    )

    rows = []
    for eps in (1e-4, 1e-5, 5e-6):
        t0 = time.time()
        try:
            got = predict_visibility(
                vis, mimg, context="ng", epsilon=eps
            )
        except ValueError as exc:
            # honest refusal below the f32 floor (x64 unlocks deeper)
            rows.append({"eps": eps, "refused": str(exc)[:120]})
            print(f"# predict eps={eps:g}: REFUSED (below f32 floor)",
                  file=sys.stderr, flush=True)
            continue
        gr = np.asarray(jnp.real(got.vis)).reshape(-1)
        gi = np.asarray(jnp.imag(got.vis)).reshape(-1)
        err = float(np.max(np.abs((gr + 1j * gi) - oracle)))
        dt = time.time() - t0
        ok = err < eps
        rows.append({"eps": eps, "err": err, "ok": ok})
        print(
            f"# predict eps={eps:g}: err={err:.3g} "
            f"({'OK' if ok else 'UNDER-DELIVER'}) {dt:.0f}s",
            file=sys.stderr, flush=True,
        )
    # invert: peak recovery at the edge
    vdft = vis.replace(
        vis=jax.lax.complex(
            jnp.asarray(np.real(oracle).astype(np.float32)),
            jnp.asarray(np.imag(oracle).astype(np.float32)),
        ).reshape(vis.vis.shape)
    )
    dirty, _ = invert_visibility(
        vdft, mimg, context="ng", epsilon=1e-5
    )
    img = np.asarray(dirty.pixels)[0, 0]
    iy, ix = np.unravel_index(np.argmax(img), img.shape)
    peak_ok = (ix, iy) == (npix // 2 + dx, npix // 2 + dy)
    print(
        f"# invert eps=1e-5 edge peak: ({ix},{iy}) "
        f"val {img[iy, ix]:.4f} ok={peak_ok}",
        file=sys.stderr,
    )
    delivered = [r for r in rows if "err" in r]
    print(json.dumps({
        "metric": "chip_epsilon_contract_edge_source",
        "value": delivered[-1]["err"] if delivered else None,
        "unit": "max predict err vs host-f64 DFT at the tightest "
                "servable f32 eps (512^2, edge source)",
        "rows": rows,
        "invert_peak_ok": bool(peak_ok),
        "invert_peak": float(img[iy, ix]),
    }), flush=True)


if __name__ == "__main__":
    main()
