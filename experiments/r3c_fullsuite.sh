#!/bin/bash
# Round-3c follower: after the r3b revalidation pipeline finishes, refresh
# the results.json rows the u16-any-prefilter + geometric-dense-split
# commits touched but r3b does not re-run: the prefilter microbenches
# (now u8 AND u16 rows), the protein/long-motif MultiScanner rows, and
# the whole-database CLI wall.
cd /root/repo
LOG=experiments/r3c_fullsuite.log
: > "$LOG"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "waiting for r3b ALL DONE..."
for i in $(seq 1 400); do
  grep -q "ALL DONE" experiments/r3b_revalidate.log 2>/dev/null && break
  sleep 60
done
if ! grep -q "ALL DONE" experiments/r3b_revalidate.log 2>/dev/null; then
  log "r3b never finished; running anyway"
fi

log "=== benchmarks: multi,multiprot,multilong ==="
timeout 3600 python benchmarks/run.py -k multi,multiprot,multilong >> "$LOG" 2>&1
log "=== benchmarks: clifull ==="
timeout 3600 python benchmarks/run.py -k clifull >> "$LOG" 2>&1
log "ALL DONE"

log "=== group sweep (u16 era) ==="
timeout 3600 python experiments/group_sweep16.py 512 1024 2048 4692 >> "$LOG" 2>&1
log "SWEEP DONE"
