"""Probe the normal-equation assembly cost at the 10M BASELINE shape:
[nsol=267, nbl=37401] baseline sums -> [nsol, 274, 274] antenna
matrices.

  scat  4x .at[:, a1, a2].set (round-1 pattern)
  take  1x static-index take per array (precomputed cell->column map)

Run: python bench_ne_scatter.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

NANTS = 274
NSOL = 267
K = 4


def main():
    rng = np.random.default_rng(1)
    a1, a2 = np.triu_indices(NANTS, 1)
    nbl = len(a1)
    xbr = jnp.asarray(rng.normal(size=(NSOL, nbl)).astype(np.float32))
    xbi = jnp.asarray(rng.normal(size=(NSOL, nbl)).astype(np.float32))
    wb = jnp.asarray(rng.random((NSOL, nbl)).astype(np.float32))
    a1j = jnp.asarray(a1.astype(np.int32))
    a2j = jnp.asarray(a2.astype(np.int32))

    # cell -> extended-column map (host, once)
    idx = np.full((NANTS, NANTS), 2 * nbl, np.int32)
    idx[a1, a2] = np.arange(nbl)          # conj half
    idx[a2, a1] = np.arange(nbl) + nbl    # plain half
    idxj = jnp.asarray(idx.reshape(-1))

    @jax.jit
    def scat(xbr, xbi, wb):
        acc = None
        for _ in range(K):
            xb = jax.lax.complex(xbr, xbi)
            x = jnp.zeros((NSOL, NANTS, NANTS), xb.dtype)
            x = x.at[:, a1j, a2j].set(jnp.conj(xb)).at[:, a2j, a1j].set(xb)
            xwt = jnp.zeros((NSOL, NANTS, NANTS), wb.dtype)
            xwt = xwt.at[:, a1j, a2j].set(wb).at[:, a2j, a1j].set(wb)
            out = jnp.sum(jnp.abs(x)) + jnp.sum(xwt)
            xbr = xbr + out * 1e-30
            acc = out if acc is None else acc + out
        return acc

    @jax.jit
    def take(xbr, xbi, wb):
        acc = None
        for _ in range(K):
            xb = jax.lax.complex(xbr, xbi)
            z = jnp.zeros((NSOL, 1), xb.dtype)
            ext = jnp.concatenate([jnp.conj(xb), xb, z], axis=1)
            x = jnp.take(ext, idxj, axis=1).reshape(NSOL, NANTS, NANTS)
            zr = jnp.zeros((NSOL, 1), wb.dtype)
            extw = jnp.concatenate([wb, wb, zr], axis=1)
            xwt = jnp.take(extw, idxj, axis=1).reshape(
                NSOL, NANTS, NANTS
            )
            out = jnp.sum(jnp.abs(x)) + jnp.sum(xwt)
            xbr = xbr + out * 1e-30
            acc = out if acc is None else acc + out
        return acc

    @jax.jit
    def noop(x):
        return x + 1.0

    def fetch(x):
        return float(np.asarray(x))

    fetch(noop(jnp.float32(0)))
    ovh = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        fetch(noop(jnp.float32(0)))
        ovh = min(ovh, time.perf_counter() - t0)
    print(f"dispatch {ovh*1e3:.1f} ms", flush=True)
    for tag, fn in (("scat", scat), ("take", take)):
        t0 = time.time()
        fetch(fn(xbr, xbi, wb))
        print(f"{tag}: compile {time.time()-t0:.0f}s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fetch(fn(xbr, xbi, wb))
            best = min(best, time.perf_counter() - t0)
        print(f"{tag}: {(best-ovh)/K*1e3:.2f} ms/op", flush=True)


if __name__ == "__main__":
    main()
