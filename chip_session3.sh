#!/bin/bash
# Round-3 session 3: re-measure the redesigned (one-hot) Pallas msclean.
set -u
OUT=${1:-/tmp/chip_r3c}
mkdir -p "$OUT"
cd "$(dirname "$0")"
log() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$OUT/session.log"; }

log "msclean one-hot kernel slope (opt-in vs XLA)"
timeout 2400 python - > "$OUT/msclean.json" 2>&1 <<'PY'
import json, sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from ska_sdp_func_python_tpu.ops.cleaners import msclean

rng = np.random.default_rng(3)
n, pb = 512, 256
iy, ix = np.mgrid[0:n, 0:n]
r2 = (iy - n//2)**2 + (ix - n//2)**2
psf = np.exp(-r2/(2*2.5**2)).astype(np.float32); psf /= psf.max()
dirty = rng.normal(size=(n, n)).astype(np.float32)
dirty[rng.integers(0, n, 50), rng.integers(0, n, 50)] += 50.0
dj = jnp.asarray(dirty)
pj = jnp.asarray(psf[n//2-pb//2:n//2+pb//2, n//2-pb//2:n//2+pb//2])

def sync(x):
    np.asarray(x).ravel()[:1]

for use_pallas in (True, None):
    def run(niter):
        c, r = msclean(dj, pj, None, None, gain=0.1, thresh=0.0,
                       niter=niter, scales=(0, 3, 10), fracthresh=0.0,
                       use_pallas=use_pallas)
        return r
    ts = {}
    for niter in (500, 8000):
        sync(run(niter))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); sync(run(niter))
            best = min(best, time.perf_counter() - t0)
        ts[niter] = best
    slope = (ts[8000] - ts[500]) / 7500
    print(json.dumps({
        "metric": "msclean_minor_cycles_per_s",
        "variant": "pallas_onehot" if use_pallas else "xla",
        "value": round(1.0/slope, 1),
    }), flush=True)
PY
grep -v WARNING "$OUT/msclean.json" | tail -4
log "done"
