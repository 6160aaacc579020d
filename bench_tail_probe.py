"""Round-3 probes: (a) raw batched-IFFT tail cost, (b) assemble group
size. K=4 chained inside one jit; dispatch overhead subtracted."""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

K = 4


def timed(fn, *args):
    r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    ts = []
    for _ in range(4):
        t0 = time.time()
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="fft")
    ap.add_argument("--group", type=int, default=0)
    args = ap.parse_args()

    # dispatch floor
    @jax.jit
    def nop(x):
        return x + 1.0

    disp = timed(nop, jnp.zeros((8, 128)))
    print(f"dispatch {disp*1e3:.1f} ms", flush=True)

    if args.what == "fft":
        nw, npad, npix = 8, 1280, 1024
        rng = np.random.default_rng(0)
        gr = jnp.asarray(rng.normal(size=(nw, npad, npad)).astype(np.float32))
        gi = jnp.asarray(rng.normal(size=(nw, npad, npad)).astype(np.float32))
        wb = jnp.asarray(rng.normal(size=(nw, npix, npix)).astype(np.float32))

        from ska_sdp_func_python_tpu.ops.fft import extract_mid, ifft

        @jax.jit
        def tail(gr, gi, wb):
            out = 0.0
            g = jax.lax.complex(gr, gi)
            for _ in range(K):
                ctr = extract_mid(ifft(g), npix)
                d = jnp.sum(jnp.real(ctr) * wb - jnp.imag(ctr) * wb, axis=0)
                out = out + d
                g = g + 1.0
            return out

        t = timed(tail, gr, gi, wb)
        print(f"tail x{K}: {(t - disp)/K*1e3:.2f} ms/iter", flush=True)

        @jax.jit
        def fft_only(gr, gi):
            g = jax.lax.complex(gr, gi)
            out = 0.0
            for _ in range(K):
                out = out + jnp.sum(jnp.real(ifft(g)))
                g = g + 1.0
            return out

        t = timed(fft_only, gr, gi)
        print(f"ifft only x{K}: {(t - disp)/K*1e3:.2f} ms/iter", flush=True)
    else:
        # full invert with patched assemble group
        import ska_sdp_func_python_tpu.ops.gridding_fused as gf

        if args.group:
            gf._assemble_group = lambda tile, nta, g=args.group: g
        from ska_sdp_func_python_tpu.ops.imaging import (
            invert_with_plan,
            make_imaging_plan,
        )
        from ska_sdp_func_python_tpu.ops.gridding_plan import sort_values

        NVIS, NPIX, CELL, NW, SUP = int(10e6), 1024, 5e-5, 8, 8
        rng = np.random.default_rng(7)
        scale = NPIX * CELL
        umax = 0.33 * NPIX / scale / 2
        u = jnp.asarray(rng.uniform(-umax, umax, NVIS).astype(np.float32))
        v = jnp.asarray(rng.uniform(-umax, umax, NVIS).astype(np.float32))
        w = jnp.asarray(rng.uniform(-50, 50, NVIS).astype(np.float32))
        vr = jnp.asarray(rng.normal(size=NVIS).astype(np.float32))
        vi = jnp.asarray(rng.normal(size=NVIS).astype(np.float32))
        plan = make_imaging_plan(
            u, v, w, npixel=NPIX, cellsize=CELL, support=SUP, nw=NW,
            padding=1.25,
        )
        vals_s = sort_values(
            plan.gp, jax.lax.complex(vr, vi)
        )

        @jax.jit
        def run(vals):
            out = 0.0
            x = vals
            for _ in range(K):
                d, _ = invert_with_plan(plan, x, values_sorted=True)
                out = out + d
                x = x * (1.0 + 1e-6)
            return out

        t = timed(run, vals_s)
        per = (t - disp) / K
        print(
            f"full invert x{K} (group={args.group or 'default'}): "
            f"{per*1e3:.2f} ms = {NVIS/per/1e6:.1f} Mvis/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
