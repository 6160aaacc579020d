"""Probe the cost structure of applying a KNOWN permutation at 10M
entries on the real chip (the round-2 top perf item: the fused cycle's
two fixed-permutation value sorts, VERDICT.md item 1).

Variants (each chained K=4 data-dependent reps inside one jit; subtract
the ~27 ms tunnel dispatch overhead):
  s2    lax.sort (i32 key, f32 payload)           -- lower bound for sort
  s3    lax.sort (key, re, im)                    -- current sort_values
  s5    lax.sort (key, 4 payloads)                -- factor sort at npol=2
  b8    batched lax.sort [8, N/8]  (key, payload) -- row-local sort cost
  b64   batched lax.sort [64, N/64] (key, payload)
  b256  batched lax.sort [256, N/256] (key, payload) rows fit VMEM
  gth   x[perm] flat gather                        -- reconfirm baseline
  seg   take-then-sort: no-op control (x + roll)   -- pure BW reference

Run: python bench_permute_probe.py [s2 s3 s5 b8 b64 b256 gth]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

N = int(10e6)
K = 4


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0].ravel()[0]
    return float(np.asarray(jnp.real(leaf)))


def timed(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    fetch(out)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    which = sys.argv[1:] or ["s2", "s3", "s5", "b64", "b256"]
    rng = np.random.default_rng(3)
    key = jnp.asarray(rng.permutation(N).astype(np.int32))
    x = jnp.asarray(rng.normal(size=N).astype(np.float32))
    y = jnp.asarray(rng.normal(size=N).astype(np.float32))

    @jax.jit
    def noop(v):
        return v + 1.0

    fetch(noop(jnp.float32(0)))
    ovh = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        fetch(noop(jnp.float32(0)))
        ovh = min(ovh, time.perf_counter() - t0)
    print(f"dispatch overhead {ovh*1e3:.1f} ms", flush=True)

    def chain(body):
        @jax.jit
        def run(k, a, b):
            acc = None
            for _ in range(K):
                out = body(k, a, b)
                eps = out[0].ravel()[0] * jnp.float32(1e-30)
                a = a + eps
                acc = out[0] if acc is None else acc + out[0]
            return acc
        return run

    def report(name, best):
        per = (best - ovh) / K
        print(f"{name}: {per*1e3:.2f} ms/op", flush=True)

    if "s2" in which:
        f = chain(lambda k, a, b: jax.lax.sort((k, a), num_keys=1)[1:])
        report("s2  (key+1 payload)", timed("s2", f, key, x, y))
    if "s3" in which:
        f = chain(lambda k, a, b: jax.lax.sort((k, a, b), num_keys=1)[1:])
        report("s3  (key+2 payloads)", timed("s3", f, key, x, y))
    if "s5" in which:
        f = chain(
            lambda k, a, b: jax.lax.sort(
                (k, a, b, a * 0.5, b * 0.5), num_keys=1
            )[1:]
        )
        report("s5  (key+4 payloads)", timed("s5", f, key, x, y))
    for tag, rows in (("b8", 8), ("b64", 64), ("b256", 256)):
        if tag in which:
            m = N // rows
            k2 = key[: rows * m].reshape(rows, m)
            f = chain(
                lambda k, a, b, rows=rows, m=m: jax.lax.sort(
                    (k.reshape(rows, m)[0:rows], a[: rows * m].reshape(rows, m)),
                    num_keys=1,
                )[1:]
            )
            report(f"{tag} ({rows}x{m} key+1 payload)",
                   timed(tag, f, k2, x, y))
    if "gth" in which:
        f = chain(lambda k, a, b: (a[k],))
        report("gth (flat gather)", timed("gth", f, key, x, y))
    if "bw" in which:
        f = chain(lambda k, a, b: (a + b,))
        report("bw  (1 add pass)", timed("bw", f, key, x, y))
    if "bx" in which or "bp" in which:
        from ska_sdp_func_python_tpu.ops.permute import (
            benes_apply, benes_plan,
        )
        from ska_sdp_func_python_tpu.ops.permute_pallas import (
            benes_apply_tpu,
        )

        t0 = time.perf_counter()
        plan = benes_plan(np.asarray(key))
        print(
            f"benes routing+upload {time.perf_counter()-t0:.1f}s "
            f"(n={plan.n})",
            flush=True,
        )
        if "bx" in which:
            f = chain(lambda k, a, b, p=plan: benes_apply(p, a, b))
            report("bx  (benes XLA, 2 payloads)", timed("bx", f, key, x, y))
        if "bp" in which:
            f = chain(
                lambda k, a, b, p=plan: benes_apply_tpu(p, a, b)
            )
            report(
                "bp  (benes pallas 3-pass, 2 payloads)",
                timed("bp", f, key, x, y),
            )
        if "bpi" in which:
            f = chain(
                lambda k, a, b, p=plan: benes_apply_tpu(
                    p, a, b, inverse=True
                )
            )
            report("bpi (benes pallas inverse)", timed("bpi", f, key, x, y))


if __name__ == "__main__":
    main()
