"""Extended benchmark: all three BASELINE.md metrics on the accelerator.

Prints one JSON line per metric (bench.py remains the driver's single-line
headline):
  - gain-solve iterations/s (64-antenna G solve, BASELINE config 1)
  - Mvis gridded/s, w-stacked invert (config 3)
  - Mvis degridded/s, w-stacked predict (config 3)
  - CLEAN minor cycles/s, 512^2 Hogbom and msclean (config 2)
"""

import json
import sys
import time

import numpy as np


def sync(x):
    import jax.numpy as jnp

    return float(np.asarray(jnp.ravel(x)[0]).real)


def bench_solver():
    import jax
    import jax.numpy as jnp

    from ska_sdp_func_python_tpu.ops.solvers import solve_gains_core

    rng = np.random.default_rng(1)
    nants, nchan, nsol, niter = 64, 1, 16, 200
    g = rng.normal(size=(nsol, nants)) + 1j * rng.normal(size=(nsol, nants))
    x = np.einsum("sa,sb->sab", g, np.conj(g))
    x = x[..., None, None] * np.ones((1, 1, 1, nchan, 1))
    xwt = np.abs(x) * 0 + 1.0

    xr = jnp.asarray(np.real(x).astype(np.float32))
    xi = jnp.asarray(np.imag(x).astype(np.float32))
    wt = jnp.asarray(xwt.astype(np.float32))

    @jax.jit
    def run(xr, xi, wt):
        xx = jax.lax.complex(xr, xi)
        gain0 = jnp.ones(
            (nsol, nants, nchan, 1, 1), dtype=jnp.complex64
        )
        gain, gwt, res = solve_gains_core(
            xx, wt, gain0, niter=niter, tol=0.0, phase_only=False, npol=1
        )
        return jnp.real(gain)

    sync(run(xr, xi, wt))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(run(xr, xi, wt))
        times.append(time.perf_counter() - t0)
    best = min(times)
    # tol=0 forces all niter iterations on all nsol intervals
    its_per_s = niter * nsol / best
    from ska_sdp_func_python_tpu.utils.roofline import (
        solver_model, roofline,
    )

    print(
        json.dumps(
            {
                "metric": "gain_solve_iterations_per_s",
                "value": round(its_per_s, 1),
                "unit": "iter/s (64ant batched x16)",
                "vs_baseline": None,
                **roofline(solver_model(niter, nsol, nants, nchan), best),
            }
        )
    )


def bench_invert_predict():
    import jax
    import jax.numpy as jnp

    from ska_sdp_func_python_tpu.ops.imaging import invert_core, predict_core

    rng = np.random.default_rng(7)
    nvis = int(2e6)
    npixel = 1024
    cellsize = 5e-5
    nw = 8
    scale = 2 * npixel * cellsize
    umax = 0.33 * 2 * npixel / scale / 2
    u = jnp.asarray(rng.uniform(-umax, umax, nvis).astype(np.float32))
    v = jnp.asarray(rng.uniform(-umax, umax, nvis).astype(np.float32))
    w = jnp.asarray(rng.uniform(-50.0, 50.0, nvis).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=nvis).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=nvis).astype(np.float32))
    wgt = jnp.ones(nvis, dtype=jnp.float32)
    img = jnp.asarray(rng.normal(size=(npixel, npixel)).astype(np.float32))

    @jax.jit
    def run_inv(u, v, w, vr, vi, wgt):
        vals = jax.lax.complex(vr, vi)
        dirty, _ = invert_core(
            u, v, w, vals, wgt, npixel=npixel, cellsize=cellsize,
            support=8, nw=nw, do_wstacking=True,
        )
        return dirty

    @jax.jit
    def run_pred(u, v, w, img):
        vals = predict_core(
            u, v, w, img, cellsize=cellsize, support=8, nw=nw,
            do_wstacking=True,
        )
        return jnp.real(vals)

    from ska_sdp_func_python_tpu.ops.imaging import _npad_for, _tile_for
    from ska_sdp_func_python_tpu.utils.roofline import (
        invert_model, predict_model, roofline,
    )

    npad = _npad_for(npixel, 2)
    for name, fn, args, model in (
        (
            "invert_mvis_per_s", run_inv, (u, v, w, vr, vi, wgt),
            invert_model(nvis, npixel, npad, nw=nw, tile=_tile_for(npad)),
        ),
        (
            "predict_mvis_per_s", run_pred, (u, v, w, img),
            predict_model(nvis, npixel, npad, nw=nw),
        ),
    ):
        sync(fn(*args))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn(*args))
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(
            json.dumps(
                {
                    "metric": name,
                    "value": round(nvis / best / 1e6, 3),
                    # the standalone core path re-sorts per call and uses
                    # padding 2; the plan path (bench.py headline) is the
                    # production steady state at ~316 Mvis/s
                    "unit": "Mvis/s (1024^2, nw=8, core path cold, "
                    "incl. per-call sort)",
                    "vs_baseline": round(nvis / best / 1e6 / 10.0, 3),
                    "npad": int(npad),
                    "tile": int(_tile_for(npad)),
                    **roofline(model, best),
                }
            )
        )


def bench_clean():
    import jax
    import jax.numpy as jnp

    from ska_sdp_func_python_tpu.ops.cleaners import hogbom, msclean

    rng = np.random.default_rng(3)
    n = 512
    iy, ix = np.mgrid[0:n, 0:n]
    r2 = (iy - n // 2) ** 2 + (ix - n // 2) ** 2
    psf = np.exp(-r2 / (2 * 2.5**2)).astype(np.float32)
    psf /= psf.max()
    dirty = rng.normal(size=(n, n)).astype(np.float32)
    dirty[rng.integers(0, n, 50), rng.integers(0, n, 50)] += 50.0
    dirty_j = jnp.asarray(dirty)
    psf_j = jnp.asarray(psf)

    # slope-based steady state: a remote-TPU dispatch costs ~30 ms fixed
    # WITH ~10 ms of jitter, so the iteration spread must be large
    # enough that the extra work dwarfs the jitter — a single-call
    # number at a few hundred iterations measures mostly the dispatch
    # (this hid an 80x in round 1), and a small spread can even go
    # negative on dispatch variance
    # round-4 lesson: msclean-family spreads below ~2000->16000 drown
    # in the ~100 ms setup+dispatch noise (negative slopes)
    spreads = {"hogbom": (1000, 50000), "msclean": (2000, 16000)}

    def run_hogbom(niter):
        c, r = hogbom(
            dirty_j, psf_j, None, gain=0.1, thresh=0.0, niter=niter,
            fracthresh=0.0,
        )
        return r

    def run_msclean(niter):
        c, r = msclean(
            dirty_j, psf_j, None, None, gain=0.1, thresh=0.0,
            niter=niter, scales=(0, 3, 10), fracthresh=0.0,
        )
        return r

    # support-bounded PSF (the deconvolve_cube psf_support contract):
    # the [ns, ns, 256, 256] cross-scale stack fits VMEM, so the whole
    # minor-cycle loop runs as one Pallas program (round-3)
    pb = 256
    psf_b = jnp.asarray(
        psf[n // 2 - pb // 2 : n // 2 + pb // 2,
            n // 2 - pb // 2 : n // 2 + pb // 2]
    )

    def run_msclean_bounded(niter):
        c, r = msclean(
            dirty_j, psf_b, None, None, gain=0.1, thresh=0.0,
            niter=niter, scales=(0, 3, 10), fracthresh=0.0,
        )
        return r

    # complex (Q+iU) Hogbom at 1024^2: the aliased-residual list kernel
    nc = 1024
    dq = rng.normal(size=(nc, nc)).astype(np.float32)
    dq[rng.integers(0, nc, 50), rng.integers(0, nc, 50)] += 50.0
    du = np.roll(dq, 7, axis=0) * np.float32(0.6)
    dq_j, du_j = jnp.asarray(dq), jnp.asarray(du)

    def run_complex_1024(niter):
        from ska_sdp_func_python_tpu.ops.cleaners import hogbom_complex

        cq, cu, rq, ru = hogbom_complex(
            dq_j, du_j, psf_b, psf_b, None, gain=0.1, thresh=0.0,
            niter=niter, fracthresh=0.0,
        )
        return rq

    spreads["msclean_bounded"] = spreads["msclean"]
    # the complex list kernel's [niter, 128] row list caps at 2048
    spreads["complex"] = (200, 2000)

    # msclean at 1024^2 (VERDICT r4 item 4): the corner kernel's stacks
    # exceed VMEM at this size, so this measures the XLA while_loop path
    n4 = 1024
    d4 = rng.normal(size=(n4, n4)).astype(np.float32)
    d4[rng.integers(0, n4, 80), rng.integers(0, n4, 80)] += 50.0
    d4_j = jnp.asarray(d4)

    def run_msclean_1024(niter):
        c, r = msclean(
            d4_j, psf_b, None, None, gain=0.1, thresh=0.0,
            niter=niter, scales=(0, 3, 10), fracthresh=0.0,
        )
        return r

    spreads["msclean1024"] = (2000, 10000)
    for name, fn in (
        ("hogbom_minor_cycles_per_s", run_hogbom),
        ("msclean_minor_cycles_per_s", run_msclean),
        ("msclean_bounded_minor_cycles_per_s", run_msclean_bounded),
        ("msclean1024_minor_cycles_per_s", run_msclean_1024),
        ("complex_hogbom_1024_minor_cycles_per_s", run_complex_1024),
    ):
        niter_lo, niter_hi = spreads[name.split("_")[0]]
        unit_n = "1024^2" if "1024" in name else "512^2"
        # INTERLEAVED pairs + median of differences: the tunnel's fixed
        # dispatch cost drifts by hundreds of ms between minutes, so
        # separately-minimised phases can produce negative slopes; the
        # paired difference cancels the drift (round-5 protocol)
        sync(fn(niter_lo))
        sync(fn(niter_hi))
        diffs = []
        for _ in range(7):
            t0 = time.perf_counter()
            sync(fn(niter_lo))
            a = time.perf_counter() - t0
            t0 = time.perf_counter()
            sync(fn(niter_hi))
            b = time.perf_counter() - t0
            diffs.append(b - a)
        slope = float(np.median(diffs)) / (niter_hi - niter_lo)
        row = {
            "metric": name,
            "value": round(1.0 / slope, 1),
            "unit": f"minor cycles/s ({unit_n}, steady state)",
            "vs_baseline": None,
        }
        if name.startswith("hogbom"):
            from ska_sdp_func_python_tpu.utils.roofline import (
                hogbom_model, roofline,
            )

            # per-iteration roofline from the slope; the VMEM-resident
            # loop's HBM traffic is only the one-off load, so the
            # per-iteration hbm fields would be meaningless — report
            # the FLOP side only
            row.update({
                k: v
                for k, v in roofline(hogbom_model(1, patch=n), slope).items()
                if k.startswith("mxu") or k == "useful_gflop"
            })
        print(json.dumps(row))


def bench_msmfs():
    """BASELINE config 4: 64-channel MSMFS moment clean.

    The moment transform/setup runs ONCE outside the timed loop (the
    previous deconvolve_cube-wrapped leg's multi-second setup variance
    swamped the minor-cycle slope); the timed quantity is msmfsclean on
    device-resident moment dirty/PSF stacks with a support-bounded PSF
    (the deconvolve_cube psf_support contract), steady-state slope
    between two niter points.
    """
    import jax
    import jax.numpy as jnp

    from ska_sdp_func_python_tpu.ops.cleaners import msmfsclean

    rng = np.random.default_rng(5)
    n, nchan, nmoment, pn = 256, 64, 3, 128
    freq = 1e8 * (1 + 0.002 * np.arange(nchan))
    iy, ix = np.mgrid[0:n, 0:n]
    r2 = (iy - n // 2) ** 2 + (ix - n // 2) ** 2
    psf2d = np.exp(-r2 / (2 * 2.5**2)).astype(np.float32)
    psf2d /= psf2d.max()
    truth = np.zeros((n, n), dtype=np.float32)
    truth[rng.integers(20, n - 20, 20), rng.integers(20, n - 20, 20)] = (
        rng.uniform(0.5, 2.0, 20).astype(np.float32)
    )
    from numpy.fft import fft2, ifft2, ifftshift

    kernel_f = fft2(ifftshift(psf2d))
    spec = (freq / freq[nchan // 2]) ** (-0.7)
    dirty2d = np.real(ifft2(fft2(truth) * kernel_f)).astype(np.float32)
    chan_dirty = spec[:, None, None] * dirty2d[None]  # [nchan, n, n]
    # 64-channel -> moment transform (Taylor weights about the centre)
    nu = (freq - freq[nchan // 2]) / freq[nchan // 2]
    wmom = np.stack([nu**m for m in range(nmoment)])  # [nm, nchan]
    dirty_m = np.einsum("mc,cyx->myx", wmom, chan_dirty) / nchan
    psf_m = np.stack(
        [
            np.mean(nu[:, None, None] ** m * psf2d[None], axis=0)
            for m in range(2 * nmoment)
        ]
    )
    # support-bounded PSF patch (deconvolve_cube psf_support contract)
    c0 = n // 2 - pn // 2
    psf_b = psf_m[:, c0:c0 + pn, c0:c0 + pn]
    dirty_j = jnp.asarray(dirty_m.astype(np.float32))
    psf_j = jnp.asarray(psf_b.astype(np.float32))

    def run(niter):
        comp, res = msmfsclean(
            dirty_j, psf_j, None, None, gain=0.7, thresh=0.0,
            niter=niter, scales=(0, 3, 10), fracthresh=0.0,
        )
        return res

    ts = {}
    for niter in (500, 12500):
        sync(run(niter))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            sync(run(niter))
            best = min(best, time.perf_counter() - t0)
        ts[niter] = best
    slope = (ts[12500] - ts[500]) / 12000.0
    print(
        json.dumps(
            {
                "metric": "msmfs_minor_cycles_per_s",
                "value": round(1.0 / slope, 1),
                "unit": "minor cycles/s (64chan->3 moments, 256^2, "
                        "psf 128^2, steady-state slope)",
                "vs_baseline": None,
            }
        )
    )


def bench_ical():
    """Fused end-to-end self-cal major cycle (see bench_ical.py)."""
    import subprocess

    for script, extra in (
        ("bench_ical.py", []),
        ("bench_ical.py", ["--rmax", "40000", "--ntimes", "76",
                           "--npixel", "1024"]),
        ("bench_msmfs_pipeline.py", []),
    ):
        out = subprocess.run(
            [sys.executable, script, *extra],
            capture_output=True, text=True, timeout=900,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    legs = {
        "solver": bench_solver,
        "invert": bench_invert_predict,
        "clean": bench_clean,
        "msmfs": bench_msmfs,
        "ical": bench_ical,
    }
    which = sys.argv[1:] or list(legs)
    for name in which:
        legs[name]()
