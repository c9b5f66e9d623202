"""Fused Pallas multi-motif prefilter: device correctness + throughput.

HISTORICAL (round 1/2 measurement artifact): the ``prefilter_bits``
kernel this script benches was superseded by ``prefilter_any`` and
deleted in round 3 -- run against a round-2 checkout (see git history)
to reproduce; kept as provenance for the RESULTS.md numbers."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tools.perf import repeat_time
from lightmotif_tpu.ops import multi, multi_kernel

OUT = "/root/repo/experiments/multi_fused_bench.out"


def log(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
    print(obj, flush=True)


def main():
    from lightmotif_tpu import CountMatrix, EncodedSequence
    from lightmotif_tpu.scanner import MultiScanner

    log({"event": "start"})
    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    L = genome.size
    seq = EncodedSequence(genome.astype(np.uint8))

    m, k = 15, 5
    for M in (16, 128, 1024):
        dms = rng.integers(0, 200, size=(M, m, k)).astype(np.float32)
        dms[:, :, 4] = 0.0
        m_pad = -(-M // 16) * 16
        filters = np.zeros((multi_kernel.MAX_MK, m_pad), np.float32)
        for j in range(m):
            filters[j * multi_kernel.LANES_PER_ROW:
                    j * multi_kernel.LANES_PER_ROW + k, :M] = dms[:, j, :].T
        # thresholds that pass ~1e-4 of positions: sum of 15 rows of
        # mean ~100 -> ~1500; pick high threshold
        t = np.full((1, m_pad), np.inf, np.float32)
        t[0, :M] = 2400.0
        n_valid = np.zeros((1, m_pad), np.int32)
        n_valid[0, :M] = L - m + 1

        lp = -(-L // multi_kernel.TILE) * multi_kernel.TILE
        flat = np.full(lp, 4, dtype=np.int8)
        flat[:L] = genome
        sdev = jax.device_put(flat)
        fdev = jax.device_put(filters)
        tdev = jax.device_put(t)
        nv = jax.device_put(n_valid)

        try:
            fn = lambda s, f, carry: multi_kernel.prefilter_bits(
                s, f + carry, tdev, nv, m, k)
            t0 = time.time()
            bits = jax.device_get(fn(sdev, fdev, jnp.float32(0.0)))
            compile_s = time.time() - t0
            words = np.ascontiguousarray(bits[:200_000]).astype(np.uint32)
            frac = float(np.unpackbits(
                words.view(np.uint8), axis=None).mean()) * 2
            # (x2: only the low 16 of each 32-bit word carry bits)
            log({"case": f"fused_M{M}", "compile_s": round(compile_s, 1),
                 "bits_set_frac": round(frac, 5)})
            per_iter, _ = repeat_time(
                lambda: (fn, (sdev, fdev), 100),
                r_lo=4, r_hi=64, trials=4)
            log({"case": f"fused_M{M}",
                 "gpm_per_s": round(L * M / per_iter / 1e9, 1),
                 "ms": round(per_iter * 1e3, 2)})
        except Exception as e:
            log({"case": f"fused_M{M}", "error": repr(e)[:400]})

    # end-to-end MultiScanner with real-ish motifs (threshold <= 255)
    motifs = []
    for i in range(128):
        sites = ["".join("ACTG"[j] for j in rng.integers(0, 4, size=12))
                 for _ in range(6)]
        cm = CountMatrix.from_sequences(EncodedSequence.encode(s) for s in sites)
        motifs.append(cm.to_freq(0.1).to_weight(None).to_scoring())
    thresholds = [p.score_distribution().score(1e-5) for p in motifs]
    ms = MultiScanner(motifs, seq, thresholds=thresholds)
    hits = ms.collect()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = len(MultiScanner(motifs, seq, thresholds=thresholds).collect())
        times.append(time.perf_counter() - t0)
    log({"case": "multiscanner_128x_genome", "hits": len(hits),
         "wall_s": round(min(times), 3),
         "gpm_per_s": round(L * 128 / min(times) / 1e9, 1)})
    log({"event": "done"})


if __name__ == "__main__":
    main()
