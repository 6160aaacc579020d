// Beneš-network routing for fixed-permutation application on TPU.
//
// The fused self-cal cycle applies the SAME permutation of ~10M entries
// every major cycle (gridder plan order <-> solver natural order). XLA's
// lax.sort applies it in ~33 ms (comparison network, O(N log^2 N)); a
// Beneš network applies a KNOWN permutation in 2*log2(N)-1 butterfly
// stages (O(N log N) work) whose control bits depend only on the
// permutation — computable ONCE at plan build. This file computes those
// control bits with the classic looping (cycle 2-coloring) algorithm in
// O(N log N) time; Python/numpy cannot traverse the routing cycles
// efficiently (inherently sequential pointer chasing).
//
// Network convention (N = 2^n, stages s = 0..2n-2):
//   stage s pairs element i with i ^ (1 << k(s)),
//   k(s) = n-1-s for s < n, s-n+1 for s >= n   (n-1, ..., 1, 0, 1, ..., n-1)
//   control bit 1 = swap the pair.
// Applying the stages in REVERSE order applies the inverse permutation
// (each stage is an involution and the k-sequence is palindromic).
//
// Output bit layout (per-ELEMENT, 8 stages packed per byte):
//   bits[(s >> 3) * N + i] bit (s & 7) = stage-s control bit of element i
// Both elements of a pair carry the same bit, so the apply step is a pure
// elementwise select against the partner: y = bit ? x[i ^ D] : x[i].
//
// C ABI for ctypes (same pattern as visio.cpp).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// dest[i] = final output position of the element at input position i
// (a permutation of [0, N)). N = 1 << nlog2. bits must hold
// ceil((2*nlog2 - 1) / 8) * N bytes, zero-initialised by the caller.
// Returns 0 on success, -1 on invalid arguments.
int benes_route(int32_t nlog2, const int64_t* dest, uint8_t* bits) {
  if (nlog2 < 1 || nlog2 > 31) return -1;
  const int64_t N = int64_t(1) << nlog2;
  const int n = nlog2;

  std::vector<int64_t> cur(dest, dest + N);
  std::vector<int64_t> nxt(N);
  std::vector<int64_t> who(N);
  std::vector<int8_t> col(N);

  auto set_bit = [&](int s, int64_t i) {
    bits[(int64_t)(s >> 3) * N + i] |= uint8_t(1u << (s & 7));
  };

  // levels m = n .. 2: input stage s_in = n - m (k = m-1),
  // output stage s_out = n + m - 2 (same k)
  for (int m = n; m >= 2; --m) {
    const int64_t M = int64_t(1) << m;
    const int64_t D = M >> 1;
    const int s_in = n - m;
    const int s_out = n + m - 2;
    for (int64_t S = 0; S < N; S += M) {
      const int64_t* d = cur.data() + S;
      // inverse map: who[t] = local input index holding target t
      for (int64_t i = 0; i < M; ++i) who[d[i]] = i;
      std::memset(col.data(), -1, M);
      // 2-colour the union of the input pairing (i, i^D) and the
      // output pairing (targets t, t^D): alternating cycle traversal
      for (int64_t a0 = 0; a0 < D; ++a0) {
        if (col[a0] >= 0) continue;
        int64_t i = a0;
        while (col[i] < 0) {
          col[i] = 0;            // i -> top subnet
          const int64_t j = i ^ D;
          col[j] = 1;            // partner -> bottom
          const int64_t t2 = d[j] ^ D;  // output partner of j's target
          i = who[t2];           // must be routed top: continue cycle
        }
      }
      // emit stage bits and the two sub-permutations
      for (int64_t a = 0; a < D; ++a) {
        if (col[a]) {  // element at a routed bottom: swap the input pair
          set_bit(s_in, S + a);
          set_bit(s_in, S + a + D);
        }
        const int64_t etop = col[a] ? a + D : a;
        const int64_t ebot = etop ^ D;
        const int64_t tt = d[etop];
        const int64_t tb = d[ebot];
        if (tt & D) {  // top-exit element needs the bottom output slot
          const int64_t o = tt & (D - 1);
          set_bit(s_out, S + o);
          set_bit(s_out, S + o + D);
        }
        nxt[S + a] = tt & (D - 1);
        nxt[S + a + D] = tb & (D - 1);
      }
    }
    cur.swap(nxt);
  }
  // middle level (blocks of 2, k = 0, stage n-1)
  const int s_mid = n - 1;
  for (int64_t S = 0; S < N; S += 2) {
    if (cur[S] == 1) {
      set_bit(s_mid, S);
      set_bit(s_mid, S + 1);
    }
  }
  return 0;
}

}  // extern "C"
