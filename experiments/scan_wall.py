"""Scanner end-to-end wall time after the transfer-frugal rework."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from lightmotif_tpu import CountMatrix, EncodedSequence
    from lightmotif_tpu.scanner import Scanner

    patterns = ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"]
    cm = CountMatrix.from_sequences(EncodedSequence.encode(p) for p in patterns)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    L = len(seq)

    dist = pssm.score_distribution()
    for pv in (1e-7, 1e-5, 1e-3):
        t = dist.score(pv)
        sc = Scanner(pssm, seq, threshold=t)
        hits = sc.collect()  # compile + warm
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            sc2 = Scanner(pssm, seq, threshold=t)
            n = len(sc2.collect())
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(json.dumps({
            "case": f"scanner_p{pv:g}", "hits": len(hits),
            "wall_s": round(best, 4),
            "eff_gpos_per_s": round(L / best / 1e9, 3)}), flush=True)

    # warm-Scanner (reused object) timing: amortized genome residency
    t = dist.score(1e-5)
    sc = Scanner(pssm, seq, threshold=t)
    sc.collect()
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        n = len(sc.collect())
        times.append(time.perf_counter() - t0)
    print(json.dumps({
        "case": "scanner_warm_p1e-05", "hits": n,
        "wall_s": round(min(times), 4),
        "eff_gpos_per_s": round(L / min(times) / 1e9, 3)}), flush=True)


if __name__ == "__main__":
    main()
