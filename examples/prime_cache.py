"""Prime the persistent jit-compilation cache for the standard shape
families (VERDICT round-1 item 10).

Remote-TPU compiles cost 30-120 s per new jit signature; the package
enables jax's persistent compilation cache (keyed per machine — see
ska_sdp_func_python_tpu/__init__.py), so compiling the standard shapes
ONCE makes every later process start warm. Run this after install, or
with --nvis/--npixel matching your observation:

    python examples/prime_cache.py                 # BASELINE shapes
    python examples/prime_cache.py --nvis 6e5 --npixel 512

Each section prints the compile time (cold) — rerun to confirm ~0 s.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _tick(label):
    t0 = time.perf_counter()

    def done(x=None):
        if x is not None:
            np.asarray(
                np.real(np.asarray(x)).ravel()[:1]
            )  # force execution
        print(f"  {label}: {time.perf_counter()-t0:.1f}s", flush=True)

    return done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nvis", type=float, default=10e6)
    ap.add_argument("--npixel", type=int, default=1024)
    ap.add_argument("--clean-size", type=int, default=512)
    ap.add_argument("--niter", type=int, default=1000)
    ap.add_argument("--nants", type=int, default=274)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ska_sdp_func_python_tpu.ops.cleaners import hogbom, msclean
    from ska_sdp_func_python_tpu.ops.gridding_plan import sort_values
    from ska_sdp_func_python_tpu.ops.imaging import (
        invert_with_plan,
        make_imaging_plan,
        predict_with_plan,
    )
    from ska_sdp_func_python_tpu.ops.solvers import solve_gains_core

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(7)
    nvis = int(args.nvis)
    npixel = args.npixel
    cellsize = 5e-5
    scale = npixel * cellsize
    umax = 0.33 * npixel / scale / 2
    u = jnp.asarray(rng.uniform(-umax, umax, nvis).astype(np.float32))
    v = jnp.asarray(rng.uniform(-umax, umax, nvis).astype(np.float32))
    w = jnp.asarray(rng.uniform(-50.0, 50.0, nvis).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=nvis).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=nvis).astype(np.float32))
    wgt = jnp.ones(nvis, dtype=jnp.float32)

    print("imaging plan family:", flush=True)
    done = _tick(f"make_imaging_plan({nvis/1e6:.0f}M, {npixel}^2)")
    plan = make_imaging_plan(
        u, v, w, npixel=npixel, cellsize=cellsize, support=8, nw=8,
        do_wstacking=True, padding=1.25, chunk=512,
    )
    done(plan.gp.rank)
    done = _tick("sort_values")
    vs = sort_values(plan.gp, jax.jit(jax.lax.complex)(vr, vi))
    done(vs)
    done = _tick("invert_with_plan (sorted)")
    d, s = invert_with_plan(plan, vs, wgt, values_sorted=True)
    done(d)
    done = _tick("invert_with_plan (unsorted)")
    d, s = invert_with_plan(
        plan, jax.jit(jax.lax.complex)(vr, vi), wgt
    )
    done(d)
    done = _tick("predict_with_plan (to_sorted)")
    mv = predict_with_plan(plan, jnp.real(d), to_sorted=True)
    done(mv)
    done = _tick("predict_with_plan (natural)")
    mv = predict_with_plan(plan, jnp.real(d))
    done(mv)

    print("clean family:", flush=True)
    n = args.clean_size
    yy, xx = np.mgrid[0:n, 0:n]
    psf = np.exp(
        -(((yy - n // 2) / 3.0) ** 2 + ((xx - n // 2) / 3.0) ** 2)
    ).astype(np.float32)
    dirty = rng.normal(size=(n, n)).astype(np.float32)
    dj, pj = jnp.asarray(dirty), jnp.asarray(psf)
    done = _tick(f"hogbom({n}^2, niter={args.niter})")
    c, r = hogbom(
        dj, pj, None, gain=0.1, thresh=0.0, niter=args.niter,
        fracthresh=0.0,
    )
    done(c)
    done = _tick(f"msclean({n}^2, niter={args.niter})")
    c, r = msclean(
        dj, pj, None, None, gain=0.1, thresh=0.0, niter=args.niter,
        scales=(0, 3, 10), fracthresh=0.0,
    )
    done(c)

    print("solver family:", flush=True)
    nants = args.nants
    x = (
        rng.normal(size=(1, nants, nants, 1, 1))
        + 1j * rng.normal(size=(1, nants, nants, 1, 1))
    )
    xr = jnp.asarray(np.real(x).astype(np.float32))
    xi = jnp.asarray(np.imag(x).astype(np.float32))
    xwt = jnp.ones((1, nants, nants, 1, 1), jnp.float32)
    g0r = jnp.ones((1, nants, 1, 1, 1), jnp.float32)

    @jax.jit
    def solve(xr, xi, xwt, g0r):
        return solve_gains_core(
            jax.lax.complex(xr, xi), xwt,
            jax.lax.complex(g0r, g0r * 0.0),
            niter=200, tol=1e-6, phase_only=True, crosspol=False,
            npol=1,
        )

    done = _tick(f"solve_gains_core({nants} ants)")
    g, gwt, res = solve(xr, xi, xwt, g0r)
    done(g)
    print("cache primed.", flush=True)


if __name__ == "__main__":
    main()
