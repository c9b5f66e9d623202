#!/usr/bin/env python
"""Headline benchmark: full-genome PSSM scan on one TPU chip.

Workload parity with the reference benchmark
(``lightmotif/benches/score.rs``, ``README.md:104-109``): score every
position of an E. coli K12-sized genome (4,641,652 bp) with the
PRODORIC MX000001 motif (15x5 PSSM, 0.1 pseudocount, uniform
background), writing the f32 score of every window to device memory --
the same work the reference's AVX2 backend does at 1029 MB/s ~= 1.029e9
positions/s on one i7-10710U core (``BASELINE.md``).  Scores are
bit-exact against the sequential host oracle (verified before timing).

The genome file is not shipped with the reference, so a deterministic
random genome of identical length is synthesized; throughput is
sequence-content independent (the kernel does identical work per
position).

Timing uses queued dispatch (N launches, one final synchronization):
the TPU in this environment is reached through a tunnel whose per-call
round-trip latency (~30 ms) would otherwise dominate the measurement.

Prints exactly one JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

ECOLI_LENGTH = 4_641_652
BASELINE_POS_PER_S = 1.029e9  # reference AVX2, single core
PATTERNS = ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"]  # == MX000001 counts
REPS = 100


def build_inputs():
    from lightmotif_tpu import CountMatrix, EncodedSequence

    cm = CountMatrix.from_sequences(EncodedSequence.encode(p) for p in PATTERNS)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()

    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=ECOLI_LENGTH, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    return pssm, seq


def bench_queued(fn, *args, reps=REPS):
    """Median per-iteration time over batches of queued dispatches."""
    import jax

    jax.block_until_ready(fn(*args))
    batches = []
    for _ in range(5):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(reps)]
        jax.block_until_ready(outs)
        batches.append((time.perf_counter() - t0) / reps)
    return float(np.median(batches))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lightmotif_tpu.ops import kernels
    from lightmotif_tpu.ops.pipeline import DeviceSequence

    pssm, seq = build_inputs()
    dseq = DeviceSequence(seq)
    m = len(pssm)
    n_scores = dseq.length - m + 1
    pssm_dev = jnp.asarray(np.asarray(pssm.data, dtype=np.float32))

    fn = jax.jit(lambda s, p: kernels.score_f32(s, p, n_scores))

    # correctness anchor: device scores == sequential host scores (f32 exact)
    out = jax.device_get(fn(dseq.data, pssm_dev))[:100_000]
    host = pssm.score_host(seq)[:100_000]
    if not np.array_equal(out, host):
        print(json.dumps({"error": "parity check failed"}), file=sys.stderr)
        raise SystemExit(1)

    t = bench_queued(fn, dseq.data, pssm_dev)
    pos_per_s = n_scores / t

    print(
        json.dumps(
            {
                "metric": "genome_scan_positions_per_second_per_chip",
                "value": pos_per_s,
                "unit": "positions/s",
                "vs_baseline": pos_per_s / BASELINE_POS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
