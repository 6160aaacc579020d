"""On-chip solver accuracy probe: where does the f32 TPU gain solve lose
precision vs the reference f64 numpy kernels?

Builds a synthetic 64-antenna scalar problem directly at the normal-equation
level (x[a1,a2] = g_a1* g_a2 + noise), solves with the reference numpy
kernel (f64, oracle) and with solve_gains_core on the TPU (f32), and
reports phase-referenced gain error at several iteration budgets. Also
checks the normal-equation BUILD accumulation (einsum over times) f32 vs
f64.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "./tests")
import jax
import jax.numpy as jnp

from ska_sdp_func_python_tpu.ops.solvers import solve_gains_core
from reference_oracle import load_solvers


def main():
    rng = np.random.default_rng(42)
    nants, nchan = 64, 1
    g_true = (
        np.exp(1j * rng.uniform(-np.pi, np.pi, nants))
        * rng.uniform(0.8, 1.2, nants)
    ).astype(np.complex128)
    g_true[0] = abs(g_true[0])  # refant phase zero-ish

    # point-source equivalent vis: x[i, j] = conj(g_i) g_j (+ tiny noise)
    x = np.conj(g_true)[:, None] * g_true[None, :]
    x = x + 1e-6 * (
        rng.normal(size=(nants, nants))
        + 1j * rng.normal(size=(nants, nants))
    )
    x = np.tril(x, -1)
    x = x + np.conj(x).T  # hermitian with zero diag
    xwt = np.ones((nants, nants, nchan, 1)) - np.eye(nants)[
        :, :, None, None
    ]
    x4 = x[:, :, None, None]

    ref = load_solvers()
    gain0 = np.ones((nants, nchan, 1, 1), dtype=np.complex128)
    for niter in (50, 200, 800):
        g_ref, gwt_ref, res_ref = (
            ref._solve_antenna_gains_itsubs_scalar(
                gain0.copy(),
                np.ones((nants, nchan, 1, 1)),
                x4.copy(),
                xwt.copy(),
                niter=niter,
                tol=1e-15,
                phase_only=False,
                refant=0,
                damping=0.5,
            )
        )
        # phase-reference and compare to truth
        gr = g_ref[:, 0, 0, 0]
        gr = gr * np.exp(-1j * np.angle(gr[0]))
        gt = g_true * np.exp(-1j * np.angle(g_true[0]))
        print(
            f"oracle f64 niter={niter}: max|g-truth|="
            f"{np.abs(gr - gt).max():.3e}",
            flush=True,
        )

        tpu_x = jnp.asarray(
            np.stack([x4.real, x4.imag], -1).astype(np.float32)
        )

        @jax.jit
        def solve_tpu(xr_i, xwt_f, n=niter):
            xx = jax.lax.complex(xr_i[..., 0], xr_i[..., 1])[None]
            ww = xwt_f[None]
            gg0 = jnp.ones(
                (1, nants, nchan, 1, 1), jnp.float32
            ).astype(xx.dtype)
            g, gwt, res = solve_gains_core(
                xx, ww, gg0, niter=n, tol=1e-30, phase_only=False,
                npol=1, refant=0, damping=0.5,
            )
            return jnp.stack(
                [jnp.real(g[0, :, 0, 0, 0]), jnp.imag(g[0, :, 0, 0, 0])],
                -1,
            )

        gout = np.asarray(
            solve_tpu(tpu_x, jnp.asarray(xwt.astype(np.float32)))
        )
        gtpu = (gout[:, 0] + 1j * gout[:, 1]).astype(np.complex128)
        gtpu = gtpu * np.exp(-1j * np.angle(gtpu[0]))
        print(
            f"tpu f32 niter={niter}:   max|g-truth|="
            f"{np.abs(gtpu - gt).max():.3e}  max|g-oracle|="
            f"{np.abs(gtpu - gr).max():.3e}",
            flush=True,
        )

    # normal-equation build accumulation: sum over 512 times, f32 vs f64
    ntimes, nbl = 512, nants * (nants - 1) // 2
    vis = (
        rng.normal(size=(ntimes, nbl)) + 1j * rng.normal(size=(ntimes, nbl))
    )
    w_t = np.ones((1, ntimes))
    acc64 = np.einsum("st,tb->sb", w_t, vis)

    @jax.jit
    def acc_f32(vr, vi, w):
        vv = jax.lax.complex(vr, vi)
        out = jnp.einsum(
            "st,tb->sb", w, vv, precision="highest"
        )
        return jnp.stack([jnp.real(out), jnp.imag(out)], -1)

    a32 = np.asarray(
        acc_f32(
            jnp.asarray(vis.real.astype(np.float32)),
            jnp.asarray(vis.imag.astype(np.float32)),
            jnp.asarray(w_t.astype(np.float32)),
        )
    )
    a32c = a32[..., 0] + 1j * a32[..., 1]
    rel = np.abs(a32c - acc64).max() / np.abs(acc64).max()
    print(f"normal-eq build f32 einsum over {ntimes} times: "
          f"max rel err {rel:.3e}", flush=True)


def gather_timing():
    """Cost of per-entry gain application via small-table gathers at 10M
    entries (sorted-domain ICAL design input)."""
    import jax

    rng = np.random.default_rng(1)
    n = int(10e6)
    nants, nsol = 512, 64
    a1 = jnp.asarray(rng.integers(0, nants, n).astype(np.int32))
    a2 = jnp.asarray(rng.integers(0, nants, n).astype(np.int32))
    ts = jnp.asarray(rng.integers(0, nsol, n).astype(np.int32))
    gr = jnp.asarray(rng.normal(size=(nsol, nants)).astype(np.float32))
    gi = jnp.asarray(rng.normal(size=(nsol, nants)).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=n).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=n).astype(np.float32))

    @jax.jit
    def apply_gains(gr, gi, vr, vi, ts, a1, a2):
        g = jax.lax.complex(gr, gi)
        flat = ts * nants
        g1 = g.reshape(-1)[flat + a1]
        g2 = g.reshape(-1)[flat + a2]
        sm = g1 * jnp.conj(g2)
        ok = jnp.abs(sm) > 0
        v = jax.lax.complex(vr, vi)
        out = jnp.where(ok, v / jnp.where(ok, sm, 1.0), 0.0)
        return jnp.real(out).sum()

    out = apply_gains(gr, gi, vr, vi, ts, a1, a2)
    float(np.asarray(out))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(apply_gains(gr, gi, vr, vi, ts, a1, a2)))
        best = min(best, time.perf_counter() - t0)
    print(f"sorted-domain gain apply (2x 10M gather from "
          f"[{nsol}x{nants}] + divide): {best*1e3:.1f} ms incl ~27ms "
          f"dispatch", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["solve", "gather"]
    if "solve" in which:
        main()
    if "gather" in which:
        gather_timing()
