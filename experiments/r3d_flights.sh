#!/bin/bash
# Round-3d follower: after r3c finishes, sweep CLI --flight-bytes on the
# clistream workload (35 MB, 7000 records) to see whether 32/64 MB
# flights beat the current 16 MB default now that fetch of flight n
# overlaps dispatch of n+1.  Uses one persistent compile cache so only
# the first run pays the remote compile service.
cd /root/repo
LOG=experiments/r3d_flights.log
: > "$LOG"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "waiting for r3c SWEEP DONE..."
for i in $(seq 1 500); do
  grep -q "SWEEP DONE" experiments/r3c_fullsuite.log 2>/dev/null && break
  sleep 60
done

D=$(mktemp -d)
export LIGHTMOTIF_TPU_COMPILE_CACHE="$D/xla"
log "generating 35 MB workload..."
python - "$D" >> "$LOG" 2>&1 <<'EOF'
import sys, os
import numpy as np
d = sys.argv[1]
rng = np.random.default_rng(29)
with open(os.path.join(d, "m.jaspar16"), "w") as fh:
    fh.write(">m1 bench\n")
    for sym, row in zip("ACGT", np.eye(4, dtype=int) * 2):
        fh.write(f"{sym} [ " + " ".join(str(v) for v in np.tile(row, 3)[:12]) + " ]\n")
lut = np.frombuffer(b"ACGT", dtype="S1")
with open(os.path.join(d, "big.fa"), "w") as fh:
    for i in range(7000):
        body = b"".join(lut[rng.integers(0, 4, size=5000)]).decode()
        fh.write(f">r{i}\n{body}\n")
EOF

for MB in 16 16 32 64 8; do
  log "=== flight-bytes ${MB}MB ==="
  timeout 1800 python -m lightmotif_tpu.cli \
    -m "$D/m.jaspar16" --format jaspar16 -s "$D/big.fa" \
    -o "$D/hits_$MB.tsv" -q --abs-threshold 8 \
    --flight-bytes $((MB * 1024 * 1024)) >> "$LOG" 2>&1
  wc -l "$D/hits_$MB.tsv" >> "$LOG"
done
log "FLIGHTS DONE"
