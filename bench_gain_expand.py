"""Measure gain->baseline expansion strategies on the real TPU.

Per self-cal cycle we need smueller[t, bl] = g[row(t), a1[bl]] * conj(
g[row(t), a2[bl]]) for ~130k baselines x ~64 intervals, then a payload
sort of the resulting per-entry stream into plan order. Candidates for
the [nsol, nants] -> [nsol, nbl] expansion:

  take   jnp.take along the minor axis (column gather)
  onehot bf16 one-hot matmul (exact for 0/1 weights)

and the end-to-end natural-domain smueller + plan-order sort at 10M.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def timeit(fn, *args, reps=3):
    fetch(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    nants, nsol = 512, 64
    nbl = nants * (nants - 1) // 2
    a1 = np.concatenate([np.full(nants - 1 - i, i) for i in range(nants)])
    a2 = np.concatenate(
        [np.arange(i + 1, nants) for i in range(nants)]
    )
    gr = jnp.asarray(rng.normal(size=(nsol, nants)).astype(np.float32))
    gi = jnp.asarray(rng.normal(size=(nsol, nants)).astype(np.float32))
    a1j = jnp.asarray(a1.astype(np.int32))
    a2j = jnp.asarray(a2.astype(np.int32))

    @jax.jit
    def take_expand(gr, gi, a1j, a2j):
        g1r = jnp.take(gr, a1j, axis=1)
        g1i = jnp.take(gi, a1j, axis=1)
        g2r = jnp.take(gr, a2j, axis=1)
        g2i = jnp.take(gi, a2j, axis=1)
        smr = g1r * g2r + g1i * g2i
        smi = g1i * g2r - g1r * g2i
        return smr.sum() + smi.sum()

    t = timeit(take_expand, gr, gi, a1j, a2j)
    print(f"take-expand [{nsol}x{nbl}]: {t*1e3:.1f} ms", flush=True)

    oh1 = jnp.asarray(
        (a1[None, :] == np.arange(nants)[:, None]).astype(np.float32)
    ).astype(jnp.bfloat16)
    oh2 = jnp.asarray(
        (a2[None, :] == np.arange(nants)[:, None]).astype(np.float32)
    ).astype(jnp.bfloat16)

    @jax.jit
    def onehot_expand(gr, gi, oh1, oh2):
        g1r = (gr.astype(jnp.bfloat16) @ oh1).astype(jnp.float32)
        g1i = (gi.astype(jnp.bfloat16) @ oh1).astype(jnp.float32)
        g2r = (gr.astype(jnp.bfloat16) @ oh2).astype(jnp.float32)
        g2i = (gi.astype(jnp.bfloat16) @ oh2).astype(jnp.float32)
        smr = g1r * g2r + g1i * g2i
        smi = g1i * g2r - g1r * g2i
        return smr.sum() + smi.sum()

    t = timeit(onehot_expand, gr, gi, oh1, oh2)
    print(f"onehot-bf16-expand [{nsol}x{nbl}]: {t*1e3:.1f} ms", flush=True)

    # end-to-end: expand + broadcast to [ntime, nbl], flatten, sort into a
    # plan-like order (random rank), as the fused cycle would
    ntime = 76  # ~10M entries
    n = ntime * nbl
    row = jnp.asarray(rng.integers(0, nsol, ntime).astype(np.int32))
    rank = jnp.asarray(rng.permutation(n).astype(np.int32))

    @jax.jit
    def smueller_sorted(gr, gi, a1j, a2j, row, rank):
        g1r = jnp.take(gr, a1j, axis=1)[row]
        g1i = jnp.take(gi, a1j, axis=1)[row]
        g2r = jnp.take(gr, a2j, axis=1)[row]
        g2i = jnp.take(gi, a2j, axis=1)[row]
        smr = (g1r * g2r + g1i * g2i).reshape(-1)
        smi = (g1i * g2r - g1r * g2i).reshape(-1)
        _, smr_s, smi_s = jax.lax.sort((rank, smr, smi), num_keys=1)
        return smr_s.sum() + smi_s.sum()

    t = timeit(smueller_sorted, gr, gi, a1j, a2j, row, rank)
    print(
        f"smueller expand+interval-bcast+sort at {n/1e6:.1f}M: "
        f"{t*1e3:.1f} ms (incl ~27ms dispatch)",
        flush=True,
    )


if __name__ == "__main__":
    main()
