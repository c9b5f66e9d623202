#!/bin/bash
# Round-3b revalidation: wait for the axon chip, then re-measure the
# rows affected by the u16 phase-C + async dispatch/fetch + vectorized
# host prep commits, plus a compilation-cache probe.
cd /root/repo
LOG=experiments/r3b_revalidate.log
: > "$LOG"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "waiting for chip..."
for i in $(seq 1 200); do
  if timeout 150 python -c "
import jax
import jax.numpy as jnp
x = jnp.ones((8,128)); (x@x.T).sum().block_until_ready()
print('chip up')" >> "$LOG" 2>&1; then
    break
  fi
  sleep 90
done
log "chip probe done"

log "=== compile-cache probe (run 1: cold) ==="
rm -rf /tmp/lmcache
for run in 1 2; do
  log "cache probe run $run"
  timeout 900 python - >> "$LOG" 2>&1 <<'EOF'
import time
t_imp = time.perf_counter()
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/lmcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np, jax.numpy as jnp
d = jax.devices()
t_dev = time.perf_counter()
from lightmotif_tpu.ops import kernels
tab = jnp.asarray(np.random.default_rng(0).normal(size=(16, 5)).astype(np.float32))
seq = jnp.asarray(np.random.default_rng(1).integers(0, 5, size=2**21).astype(np.uint8))
t0 = time.perf_counter()
out = kernels.score_f32(seq, tab, seq.shape[0] - 15)
out.block_until_ready()
t1 = time.perf_counter()
print(f"devices {t_dev - t_imp:.1f}s  pallas first-call {t1 - t0:.1f}s", flush=True)
import glob
print("cache entries:", len(glob.glob("/tmp/lmcache/*")), flush=True)
EOF
done

log "=== benchmarks: jaspar ==="
timeout 1800 python benchmarks/run.py -k jaspar >> "$LOG" 2>&1
log "=== benchmarks: jasparfull ==="
timeout 2400 python benchmarks/run.py -k jasparfull >> "$LOG" 2>&1
log "=== benchmarks: clistream ==="
timeout 2400 python benchmarks/run.py -k clistream >> "$LOG" 2>&1
log "=== bench.py (driver contract) ==="
timeout 1800 python bench.py >> "$LOG" 2>&1
log "ALL DONE"
