"""On-chip accuracy + steady-state timing probe for gridder precision modes.

Part A (accuracy, 200k vis, 256^2, nw=8): planned invert at highest vs
bf16x3 vs a direct DFT dirty image (the exact transform); planned predict
(sorted) vs direct DFT of a sparse model image.

Part B (timing, BASELINE 10M vis, 1024^2, nw=8): steady-state
invert_with_plan(values_sorted=True) and predict_with_plan(to_sorted=True)
at each precision; single-call timings include ~27 ms dispatch overhead.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from ska_sdp_func_python_tpu.ops.imaging import (
    invert_with_plan,
    make_imaging_plan,
    predict_with_plan,
)
from ska_sdp_func_python_tpu.ops.gridding_plan import sort_values


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0].ravel()[0]
    return float(np.asarray(jnp.real(leaf)))


def timeit(name, fn, *args, reps=3, nvis=None, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    fetch(out)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    rate = f"  ({nvis/best/1e6:.1f} Mvis/s incl dispatch)" if nvis else ""
    print(f"{name}: best {best*1e3:.1f} ms{rate}", flush=True)
    return out


def part_a():
    rng = np.random.default_rng(3)
    nvis, npix, cell, nw = 200_000, 256, 2e-4, 8
    scale = npix * cell
    umax = 0.33 * npix / scale / 2
    u = jnp.asarray(rng.uniform(-umax, umax, nvis).astype(np.float32))
    v = jnp.asarray(rng.uniform(-umax, umax, nvis).astype(np.float32))
    w = jnp.asarray(rng.uniform(-60.0, 60.0, nvis).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=nvis).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=nvis).astype(np.float32))

    plan = make_imaging_plan(
        u, v, w, npixel=npix, cellsize=cell, support=8, nw=nw,
        do_wstacking=True,
    )
    fetch(plan.gp.rank)

    @jax.jit
    def dft_dirty(u, v, w, vr, vi):
        # exact transform: d(l,m) = Re sum_k V_k e^{+2pi i (u l + v m
        # + w (n-1))}, chunked over vis
        vals = jax.lax.complex(vr, vi)
        x = (jnp.arange(npix) - npix // 2) * cell
        ll, mm = jnp.meshgrid(x, x, indexing="xy")
        nm1 = jnp.sqrt(jnp.maximum(1.0 - ll**2 - mm**2, 0.0)) - 1.0

        def body(carry, inp):
            uu, vv, ww, vv2 = inp
            phase = 2.0 * jnp.pi * (
                -uu[:, None, None] * ll[None]
                + vv[:, None, None] * mm[None]
                + ww[:, None, None] * nm1[None]
            )
            c = jnp.cos(phase)
            s = jnp.sin(phase)
            contrib = jnp.einsum(
                "k,kxy->xy", jnp.real(vv2), c,
                precision="highest",
            ) - jnp.einsum(
                "k,kxy->xy", jnp.imag(vv2), s, precision="highest"
            )
            return carry + contrib, None

        chunk = 2000
        nb = nvis // chunk
        out, _ = jax.lax.scan(
            body,
            jnp.zeros((npix, npix), jnp.float32),
            (
                u.reshape(nb, chunk),
                v.reshape(nb, chunk),
                w.reshape(nb, chunk),
                vals.reshape(nb, chunk),
            ),
        )
        return out

    truth = dft_dirty(u, v, w, vr, vi)
    tpeak = float(np.asarray(jnp.max(jnp.abs(truth))))
    vals = jax.jit(jax.lax.complex)(vr, vi)
    wgt = jnp.ones(nvis, dtype=jnp.float32)
    res = {}
    for prec in ("highest", "bf16x3", "default"):
        d, _ = invert_with_plan(plan, vals, wgt, precision=prec)
        d = d / nvis
        err = float(np.asarray(jnp.max(jnp.abs(d - truth / nvis)))) / (
            tpeak / nvis
        )
        res[prec] = (d, err)
        print(f"A invert {prec}: max|dirty-DFT|/peak = {err:.3e}",
              flush=True)
    dh = res["highest"][0]
    for prec in ("bf16x3", "default"):
        dd = float(np.asarray(jnp.max(jnp.abs(res[prec][0] - dh)))) / (
            tpeak / nvis
        )
        print(f"A invert {prec} vs highest: {dd:.3e}", flush=True)

    # predict accuracy: sparse model image vs direct phasor sum
    img = jnp.zeros((npix, npix), jnp.float32)
    pts = [(npix // 2 + 11, npix // 2 - 7, 1.0),
           (npix // 2 - 23, npix // 2 + 17, 0.6)]
    for iy, ix, f in pts:
        img = img.at[iy, ix].set(f)

    @jax.jit
    def dft_predict(u, v, w):
        x = (jnp.arange(npix) - npix // 2) * cell
        acc_r = jnp.zeros(u.shape, jnp.float32)
        acc_i = jnp.zeros(u.shape, jnp.float32)
        for iy, ix, f in pts:
            ll = x[ix]
            mm = x[iy]
            nm1 = jnp.sqrt(jnp.maximum(1.0 - ll**2 - mm**2, 0.0)) - 1.0
            ph = 2.0 * jnp.pi * ((-u) * ll + v * mm + w * nm1)
            acc_r = acc_r + f * jnp.cos(-ph)
            acc_i = acc_i + f * jnp.sin(-ph)
        return acc_r, acc_i

    pr, pi = dft_predict(u, v, w)
    ptruth = jax.jit(jax.lax.complex)(pr, pi)
    pscale = float(np.asarray(jnp.max(jnp.abs(ptruth))))
    for prec in ("highest", "bf16x3", "default"):
        pv = predict_with_plan(plan, img, precision=prec)
        err = float(np.asarray(jnp.max(jnp.abs(pv - ptruth)))) / pscale
        print(f"A predict {prec}: max|vis-DFT|/peak = {err:.3e}",
              flush=True)
    # sorted-domain round trip: predict(to_sorted) must equal
    # sort_values(predict())
    ps = predict_with_plan(plan, img, to_sorted=True, precision="highest")
    pu = predict_with_plan(plan, img, to_sorted=False, precision="highest")
    d = float(np.asarray(jnp.max(jnp.abs(ps - sort_values(plan.gp, pu)))))
    print(f"A predict sorted-vs-sort(unsorted): {d:.3e}", flush=True)


def part_b():
    rng = np.random.default_rng(7)
    nvis, npix, cell, nw = int(10e6), 1024, 5e-5, 8
    scale = npix * cell
    umax = 0.33 * npix / scale / 2
    u = jnp.asarray(rng.uniform(-umax, umax, nvis).astype(np.float32))
    v = jnp.asarray(rng.uniform(-umax, umax, nvis).astype(np.float32))
    w = jnp.asarray(rng.uniform(-50.0, 50.0, nvis).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=nvis).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=nvis).astype(np.float32))
    wgt = jnp.ones(nvis, dtype=jnp.float32)
    t0 = time.perf_counter()
    plan = make_imaging_plan(
        u, v, w, npixel=npix, cellsize=cell, support=8, nw=nw,
        do_wstacking=True,
    )
    fetch(plan.gp.rank)
    print(f"B plan build: {time.perf_counter()-t0:.1f}s", flush=True)
    vals = jax.jit(jax.lax.complex)(vr, vi)
    vs = sort_values(plan.gp, vals)
    fetch(vs)
    img = jnp.zeros((npix, npix), jnp.float32).at[512, 500].set(1.0)
    for prec in ("bf16x3", "highest"):
        timeit(
            f"B invert sorted {prec}", invert_with_plan, plan, vs, wgt,
            values_sorted=True, precision=prec, nvis=nvis,
        )
        timeit(
            f"B predict sorted {prec}", predict_with_plan, plan, img,
            to_sorted=True, precision=prec, nvis=nvis,
        )
    timeit(
        "B predict unsorted bf16x3", predict_with_plan, plan, img,
        to_sorted=False, precision="bf16x3", nvis=nvis,
    )
    timeit(
        "B invert unsorted bf16x3", invert_with_plan, plan, vals, wgt,
        values_sorted=False, precision="bf16x3", nvis=nvis,
    )


if __name__ == "__main__":
    which = sys.argv[1:] or ["a", "b"]
    if "a" in which:
        part_a()
    if "b" in which:
        part_b()
