"""Fixed-permutation application via Beneš networks.

The fused self-cal major cycle (pipeline.py) applies the SAME ~10M-entry
permutation every cycle: gridder plan order <-> solver natural order (the
reference's equivalent orderings are the ng gridder's internal sort vs the
[time, baseline] solver layout, imaging/ng.py + calibration/solvers.py).
Round 2 measured XLA ``lax.sort`` at a ~33-37 ms floor for this at 10M
entries regardless of payload count — ~70 ms of every 188 ms cycle was two
comparison sorts applying a permutation that is KNOWN at plan build.

A Beneš network applies a known permutation of N = 2^n elements in
2n-1 butterfly stages; stage s swaps element pairs (i, i ^ 2^k(s)) under
precomputed control bits, with k(s) = n-1, ..., 1, 0, 1, ..., n-1. The
bits depend only on the permutation and are computed once at plan build
(native/benes.cpp, O(N log N) looping algorithm). Applying the stages in
reverse order applies the inverse permutation (each stage is an
involution; the k-sequence is palindromic).

Two apply paths:

* :func:`benes_apply` — pure XLA (runs everywhere): one elementwise
  select per stage. O(N log N) traffic; on TPU ~3x faster than the sort
  for few payloads, and the correctness reference for the kernel below.
* :func:`benes_apply_tpu` (ops/permute_pallas.py) — 3 bandwidth passes:
  the opening k >= K stages, all middle k < K stages (VMEM-resident
  blocks), and the closing k >= K stages, where K = block log2. This is
  the production TPU path (~bandwidth-limited, independent of n).

Bit layout (shared with native/benes.cpp): per ELEMENT, 8 stages packed
per byte — ``groups[s // 8][i] >> (s % 8) & 1`` is element i's stage-s
bit. Both elements of a pair carry the same bit, so a stage is
``y = bit ? x[i ^ D] : x[i]`` with no index arithmetic at runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "BenesPlan",
    "benes_plan",
    "benes_apply",
    "route_bits",
]

_LIB = None
_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE = os.path.join(
    os.path.dirname(os.path.dirname(_HERE)), "native"
)
_SO_DIR = os.path.join(os.path.dirname(_HERE), "io")


def _load_lib():
    """Build (once, on demand) and load native/benes.cpp."""
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_SO_DIR, "libbenes.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE, f"BUILD={_SO_DIR}"],
                check=True,
                capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.benes_route.argtypes = [
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.benes_route.restype = ctypes.c_int32
    _LIB = lib
    return lib


def _route_py(dest: np.ndarray, n: int, bits: np.ndarray) -> None:
    """Pure-Python routing fallback (tests / no toolchain). Same looping
    algorithm as native/benes.cpp; fine for N up to ~10^5."""
    N = 1 << n
    cur = dest.astype(np.int64).copy()
    for m in range(n, 1, -1):
        M = 1 << m
        D = M >> 1
        s_in, s_out = n - m, n + m - 2
        nxt = np.empty_like(cur)
        for S in range(0, N, M):
            d = cur[S:S + M]
            who = np.empty(M, np.int64)
            who[d] = np.arange(M)
            col = np.full(M, -1, np.int8)
            for a0 in range(D):
                if col[a0] >= 0:
                    continue
                i = a0
                while col[i] < 0:
                    col[i] = 0
                    j = i ^ D
                    col[j] = 1
                    i = int(who[int(d[j]) ^ D])
            for a in range(D):
                if col[a]:
                    bits[s_in >> 3, S + a] |= 1 << (s_in & 7)
                    bits[s_in >> 3, S + a + D] |= 1 << (s_in & 7)
                etop = a + D if col[a] else a
                tt = int(d[etop])
                tb = int(d[etop ^ D])
                if tt & D:
                    o = tt & (D - 1)
                    bits[s_out >> 3, S + o] |= 1 << (s_out & 7)
                    bits[s_out >> 3, S + o + D] |= 1 << (s_out & 7)
                nxt[S + a] = tt & (D - 1)
                nxt[S + a + D] = tb & (D - 1)
        cur = nxt
    s_mid = n - 1
    swap_mid = cur[0::2] == 1
    rep = np.repeat(swap_mid, 2).astype(np.uint8)
    bits[s_mid >> 3] |= rep << (s_mid & 7)


def route_bits(dest: np.ndarray) -> np.ndarray:
    """Beneš control bits for a permutation given in destination form
    (``dest[i]`` = output position of input element i, N = 2^n).

    Returns uint8 [ngroups, N]; see module docstring for the layout.
    """
    N = int(dest.shape[0])
    n = int(N - 1).bit_length()
    if N != 1 << n or N < 2:
        raise ValueError(f"N must be a power of two >= 2, got {N}")
    nstages = 2 * n - 1
    ngroups = (nstages + 7) // 8
    bits = np.zeros((ngroups, N), np.uint8)
    lib = _load_lib()
    if lib is not None:
        d64 = np.ascontiguousarray(dest, np.int64)
        rc = lib.benes_route(
            n,
            d64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            raise RuntimeError(f"benes_route failed: {rc}")
    else:
        _route_py(np.asarray(dest), n, bits)
    return bits


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class BenesPlan:
    """Device-resident Beneš control bits for one fixed permutation.

    ``apply(plan, x)[j] == x[idx[j]]`` for the gather index the plan was
    built from; ``inverse=True`` applies the inverse (scatter) direction.
    """

    groups: tuple  # of uint8 [N] device arrays (8 stages per byte)
    n: int  # log2 of padded size
    size: int  # real (unpadded) element count

    @property
    def nstages(self) -> int:
        return 2 * self.n - 1

    def tree_flatten(self):
        return (self.groups,), (self.n, self.size)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(groups=children[0], n=aux[0], size=aux[1])


def benes_plan(gather_idx: np.ndarray, size: int | None = None) -> BenesPlan:
    """Build a :class:`BenesPlan` from a gather index (``y = x[idx]``).

    ``gather_idx`` must be a permutation of [0, len(idx)). The plan pads
    to the next power of two with identity routing; applies slice the
    padding back off.
    """
    idx = np.asarray(gather_idx, np.int64)
    N_real = size if size is not None else int(idx.shape[0])
    if idx.shape[0] != N_real:
        raise ValueError("size mismatch")
    n = max(1, int(N_real - 1).bit_length())
    N = 1 << n
    dest = np.arange(N, dtype=np.int64)
    # dest[idx[j]] = j  (element at input idx[j] lands at output j)
    dest[idx] = np.arange(N_real, dtype=np.int64)
    # a non-permutation would send the routing's cycle traversal into an
    # infinite loop — validate up front
    seen = np.zeros(N, bool)
    seen[idx] = True
    if int(seen[:N_real].sum()) != N_real:
        raise ValueError("gather_idx is not a permutation of [0, N)")
    bits = route_bits(dest)
    groups = tuple(jnp.asarray(g) for g in bits)
    return BenesPlan(groups=groups, n=n, size=N_real)


def _stage_k(s: int, n: int) -> int:
    return n - 1 - s if s < n else s - n + 1


def _apply_stage(x, bit, k):
    """One butterfly stage: y[i] = bit[i] ? x[i ^ 2^k] : x[i]."""
    D = 1 << k
    x3 = x.reshape(-1, 2, D)
    swapped = x3[:, ::-1, :].reshape(x.shape)
    return jnp.where(bit, swapped, x)


def benes_apply(plan: BenesPlan, *payloads, inverse: bool = False):
    """Apply the plan's permutation to one or more same-length payloads.

    Pure-XLA path (CPU + TPU): 2n-1 elementwise selects. Complex payloads
    are split into real/imag lanes internally (axon-tunnel safe).
    Returns a single array or a tuple matching ``payloads``.
    """
    n, N, size = plan.n, 1 << plan.n, plan.size
    # a LIST, not an iterator: the stage loop runs once per payload
    # component (re/im and every extra payload) and must not exhaust
    order = list(range(plan.nstages))
    if inverse:
        order = order[::-1]

    def run(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.complexfloating):
            re, im = run(jnp.real(x)), run(jnp.imag(x))
            return jax.lax.complex(re, im).astype(x.dtype)
        xp = jnp.pad(x, (0, N - size)) if size != N else x
        for s in order:
            grp = plan.groups[s >> 3]
            bit = ((grp >> np.uint8(s & 7)) & np.uint8(1)) != 0
            xp = _apply_stage(xp, bit, _stage_k(s, n))
        return xp[:size] if size != N else xp

    out = tuple(run(p) for p in payloads)
    return out[0] if len(out) == 1 else out
