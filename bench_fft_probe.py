"""FFT-tail size probe (VERDICT r4: the 7.5 ms invert tail).

The invert tail batch-iffts the [nw, npad, npad] grid stack. npad comes
from the 7-smooth 56-family selection (1344 = 2^6*3*7 at the BASELINE),
but XLA:TPU FFT performance is strongly radix-dependent — if non-2^k
sizes fall off a cliff (Bluestein/mixed-radix), padding the FFT UP to a
friendlier size could beat the smaller transform. Measures batched
ifft2 for the candidate sizes with the K-chained protocol (CLAUDE.md:
single-call timings under ~50 ms are dispatch noise).

Run (real TPU): python bench_fft_probe.py [--nw 8] [--reps 6]
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nw", type=int, default=8)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument(
        "--sizes", default="1024,1280,1344,1536,1792,2048",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="pin the CPU backend (interpret smoke tests; the axon "
        "tunnel prepends itself over JAX_PLATFORMS=cpu)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # dispatch floor
    f = jax.jit(lambda x: x + 1.0)
    x0 = np.zeros((8,), np.float32)
    np.asarray(f(x0))
    t0 = time.time()
    for _ in range(6):
        np.asarray(f(x0))
    floor = (time.time() - t0) / 6
    print(f"# dispatch floor {floor*1e3:.1f} ms", file=sys.stderr)

    K = args.reps
    for n in [int(s) for s in args.sizes.split(",")]:
        import jax as _jax

        re = _jax.device_put(np.random.default_rng(0).normal(
            size=(args.nw, n, n)
        ).astype(np.float32))

        @jax.jit
        def chained(re, im):
            g = jax.lax.complex(re, im)
            acc = jnp.float32(0.0)
            for _ in range(K):
                g = jnp.fft.ifft2(g)
                # data dependence so XLA cannot collapse the chain
                g = g + jax.lax.complex(
                    acc * 0.0 + 1e-8, acc * 0.0
                )
                acc = acc + jnp.real(g[0, 0, 0])
            return acc

        im = _jax.device_put(np.zeros(re.shape, np.float32))
        r = chained(re, im)
        np.asarray(r)  # compile + settle
        t0 = time.time()
        np.asarray(chained(re, im))
        t = time.time() - t0
        per = (t - floor) / K
        print(json.dumps({
            "metric": "batched_ifft2_ms",
            "n": n,
            "nw": args.nw,
            "value": round(per * 1e3, 3),
            "per_point_ns": round(per / (args.nw * n * n) * 1e9, 3),
        }), flush=True)


if __name__ == "__main__" and "--tail" not in sys.argv:
    main()


def tail_probe(argv=None):
    """Compare the full invert image tails (fft vs matmul) at a given
    geometry: python bench_fft_probe.py --tail [--npixel 1024]"""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--tail", action="store_true")
    ap.add_argument("--npixel", type=int, default=1024)
    ap.add_argument("--nw", type=int, default=8)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args, _ = ap.parse_known_args(argv)

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, ".")
    from ska_sdp_func_python_tpu.ops.imaging import (
        make_imaging_plan, uv_grids_to_dirty,
    )

    rng = np.random.default_rng(0)
    npixel = args.npixel
    cell = 5e-5 * 1024 / npixel
    umax = 0.4 / (2 * cell)
    n = 30000
    plan = make_imaging_plan(
        jnp.asarray(rng.uniform(-umax, umax, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-umax, umax, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-60, 60, n).astype(np.float32)),
        npixel=npixel, cellsize=cell, support=8, nw=args.nw,
        do_wstacking=True, padding=1.25,
    )
    npad = plan.npad
    gr = jax.device_put(
        rng.normal(size=(args.nw, npad, npad)).astype(np.float32)
    )
    gi = jax.device_put(np.zeros((args.nw, npad, npad), np.float32))

    f0 = jax.jit(lambda x: x + 1.0)
    np.asarray(f0(np.zeros((8,), np.float32)))
    t0 = time.time()
    for _ in range(6):
        np.asarray(f0(np.zeros((8,), np.float32)))
    floor = (time.time() - t0) / 6
    print(f"# dispatch floor {floor*1e3:.1f} ms", file=sys.stderr)

    K = args.reps
    for tail in ("fft", "matmul"):

        @jax.jit
        def chained(gr, gi, tail=tail):
            g = jax.lax.complex(gr, gi)
            acc = jnp.float32(0.0)
            for _ in range(K):
                d = uv_grids_to_dirty(plan, g, tail=tail)
                acc = acc + d[0, 0]
                g = g + (acc * 1e-20)  # data dependence
            return acc

        np.asarray(chained(gr, gi))
        t0 = time.time()
        np.asarray(chained(gr, gi))
        per = (time.time() - t0 - floor) / K
        print(json.dumps({
            "metric": "invert_tail_ms", "tail": tail,
            "npixel": npixel, "npad": npad, "nw": args.nw,
            "value": round(per * 1e3, 3),
        }), flush=True)


if __name__ == "__main__" and "--tail" in sys.argv:
    tail_probe()
    sys.exit(0)
