"""Chip measurement of the corner-frame Pallas msclean kernel vs the
round-3 kernel and the XLA while_loop (VERDICT r3 item 6: target
>=100k minor cycles/s at 512^2).

Protocol: slope between two niter points (CLAUDE.md: single-call
timings below ~50 ms are dispatch noise; CLEAN rates must be measured
as (t(n2) - t(n1)) / (n2 - n1)). The dirty image is built so the clean
runs to the full iteration budget (no early threshold stop).

Run (real TPU): python bench_msclean_corner.py [--n 512] [--pn 256]
"""

import argparse
import json
import sys
import time

import numpy as np


def build(n, pn, rng):
    yy, xx = np.mgrid[0:pn, 0:pn]
    psf = np.exp(
        -(((yy - pn // 2) / 3.0) ** 2 + ((xx - pn // 2) / 3.0) ** 2)
    ).astype(np.float32)
    big = np.zeros((n, n), np.float32)
    big[n // 2 - pn // 2:n // 2 + pn // 2,
        n // 2 - pn // 2:n // 2 + pn // 2] = psf
    dirty = np.zeros((n, n), np.float32)
    rs = rng.integers(pn // 2, n - pn // 2, (60, 2))
    for (y, x), f in zip(rs, rng.uniform(0.5, 3.0, 60)):
        dirty += f * np.roll(np.roll(big, y - n // 2, 0), x - n // 2, 1)
    dirty += 0.4 * np.exp(
        -(((np.mgrid[0:n, 0:n][0] - n // 3) / 30.0) ** 2
          + ((np.mgrid[0:n, 0:n][1] - n // 2) / 30.0) ** 2)
    ).astype(np.float32)
    return dirty, psf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--pn", type=int, default=256)
    ap.add_argument("--n1", type=int, default=200)
    ap.add_argument("--n2", type=int, default=1200)
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

    from ska_sdp_func_python_tpu.ops.cleaners import msclean

    rng = np.random.default_rng(7)
    dirty, psf = build(args.n, args.pn, rng)
    d = jnp.asarray(dirty)
    p = jnp.asarray(psf)

    def run(variant, niter):
        c, r = msclean(
            d, p, gain=0.1, niter=niter, fracthresh=1e-6,
            use_pallas=variant,
        )
        return float(jnp.max(jnp.abs(r))), c

    for variant, name in ((False, "xla"), (True, "corner"), ("v1", "v1")):
        try:
            # compile both signatures
            run(variant, args.n1)
            run(variant, args.n2)
            t0 = time.time()
            pk1, c1 = run(variant, args.n1)
            t1 = time.time() - t0
            t0 = time.time()
            pk2, c2 = run(variant, args.n2)
            t2 = time.time() - t0
            rate = (args.n2 - args.n1) / (t2 - t1)
            print(json.dumps({
                "metric": "msclean_it_per_s",
                "variant": name,
                "value": round(rate, 1),
                "n": args.n, "pn": args.pn,
                "t_n1_ms": round(t1 * 1e3, 1),
                "t_n2_ms": round(t2 * 1e3, 1),
                "residual_peak": round(pk2, 5),
                "comps_sum": round(float(jnp.sum(c2)), 4),
            }), flush=True)
        except Exception as exc:
            print(f"# {name} FAILED: {exc}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
