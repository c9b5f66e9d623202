"""JASPAR-scale database scan demo: 1024 motifs x E. coli genome,
end-to-end through MultiScanner on one chip."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from lightmotif_tpu import CountMatrix, EncodedSequence
    from lightmotif_tpu.scanner import MultiScanner

    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    L = len(seq)

    M = 1024
    motifs = []
    for i in range(M):
        width = int(rng.integers(8, 21))
        sites = ["".join("ACTG"[j] for j in rng.integers(0, 4, size=width))
                 for _ in range(6)]
        cm = CountMatrix.from_sequences(
            EncodedSequence.encode(s) for s in sites)
        motifs.append(cm.to_freq(0.1).to_weight(None).to_scoring())
    thresholds = [p.score_distribution().score(1e-6) for p in motifs]
    print("motifs built", flush=True)

    ms = MultiScanner(motifs, seq, thresholds=thresholds, capacity=1 << 16)
    t0 = time.perf_counter()
    hits = ms.collect()
    t1 = time.perf_counter()
    print(json.dumps({"case": "first_collect_with_compile",
                      "s": round(t1 - t0, 1), "hits": len(hits)}), flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = len(MultiScanner(motifs, seq, thresholds=thresholds,
                             capacity=ms.capacity).collect())
        times.append(time.perf_counter() - t0)
        assert n == len(hits)
    best = min(times)
    print(json.dumps({
        "case": "jaspar_scale_1024x_genome",
        "hits": len(hits),
        "wall_s": round(best, 3),
        "gpm_per_s": round(L * M / best / 1e9, 1),
        "per_motif_equiv_gpos_per_s": round(L * M / best / 1e9 / 1.029, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
