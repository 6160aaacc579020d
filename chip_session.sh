#!/bin/bash
# Round-3 chip measurement session: run after tunnel recovery.
# Usage: bash chip_session.sh [outdir]   (default /tmp/chip_r3)
# Order: cheap probes -> headline -> accuracy -> extended -> 1B streamed.
set -u
OUT=${1:-/tmp/chip_r3}
mkdir -p "$OUT"
cd "$(dirname "$0")"

log() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$OUT/session.log"; }

log "tunnel health"
timeout 120 python -c "
import time, numpy as np, jax, jax.numpy as jnp
t0=time.time(); d = jnp.asarray(np.ones((8,128), np.float32)); f=np.asarray(d)[0,0]
print(f'tiny roundtrip {time.time()-t0:.2f}s; dev={jax.devices()[0]}')" \
    > "$OUT/health.log" 2>&1 || { log "tunnel still down"; exit 1; }
cat "$OUT/health.log"

log "probe: tile56/npad1344 (MXU-exact panels)"
timeout 1800 python bench_t3_probe.py --tile 56 --npad 1344 \
    --stages kern,kasm,full > "$OUT/probe_t56.log" 2>&1
tail -5 "$OUT/probe_t56.log"

log "probe: assemble group 4 (tile 64)"
timeout 1500 python bench_tail_probe.py --what grid --group 4 \
    > "$OUT/probe_g4.log" 2>&1
tail -2 "$OUT/probe_g4.log"

log "probe: fft tail split"
timeout 1500 python bench_tail_probe.py --what fft \
    > "$OUT/probe_fft.log" 2>&1
tail -3 "$OUT/probe_fft.log"

log "headline bench.py"
timeout 2400 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.err"
cat "$OUT/bench.json"

log "accuracy sweep (chip, f32 + compensated)"
timeout 2400 python bench_accuracy.py --quick --nvis 100000 \
    > "$OUT/acc_f32.json" 2>&1
timeout 2400 python bench_accuracy.py --quick --nvis 100000 --f64-coords \
    > "$OUT/acc_comp.json" 2>&1
grep "^#" "$OUT/acc_f32.json" "$OUT/acc_comp.json" | tail -6

log "bench_all (solver/clean/cycle suite)"
timeout 3600 python bench_all.py > "$OUT/bench_all.json" 2> "$OUT/bench_all.err"
tail -8 "$OUT/bench_all.json"

log "1B-visibility streamed self-cal (the long one)"
timeout 21000 python bench_streamed.py --path /root/repo/_stream1b.svis \
    --keep --nmajor 2 --npixel 1024 --chunk-times 200 \
    > "$OUT/streamed_1b.json" 2> "$OUT/streamed_1b.err"
tail -3 "$OUT/streamed_1b.json"
log "done"
