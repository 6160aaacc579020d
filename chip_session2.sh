#!/bin/bash
# Post-1B probes: tile56, assemble groups, fft tail, accuracy nw32.
set -u
OUT=${1:-/tmp/chip_r3b}
mkdir -p "$OUT"
cd "$(dirname "$0")"
log() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$OUT/session.log"; }

log "probe: tile56/npad1344"
timeout 1800 python bench_t3_probe.py --tile 56 --npad 1344 \
    --stages kern,kasm,full > "$OUT/probe_t56.log" 2>&1
grep -v WARNING "$OUT/probe_t56.log" | tail -8

log "probe: assemble group 4"
timeout 1800 python bench_tail_probe.py --what grid --group 4 \
    > "$OUT/probe_g4.log" 2>&1
grep -v WARNING "$OUT/probe_g4.log" | tail -2

log "probe: fft tail"
timeout 1800 python bench_tail_probe.py --what fft \
    > "$OUT/probe_fft.log" 2>&1
grep -v WARNING "$OUT/probe_fft.log" | tail -3

log "accuracy nw32 (coordinate-isolated)"
timeout 2400 python bench_accuracy.py --quick --nvis 100000 --nw 32 \
    > "$OUT/acc_f32.json" 2>&1
timeout 2400 python bench_accuracy.py --quick --nvis 100000 --nw 32 \
    --f64-coords > "$OUT/acc_comp.json" 2>&1
grep "^#" "$OUT/acc_f32.json" "$OUT/acc_comp.json" | tail -6
log "done"
