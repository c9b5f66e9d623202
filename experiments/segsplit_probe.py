"""Does splitting the genome into segments overlap the hit-head
transfer with later segments' compute?

The jasparfull steady wall decomposes as ~device + RTT + the ~860 KB
hit-head transfer (~25-50 ms at tunnel bandwidth).  With one segment
the transfer can only start after ALL compute finishes; with N
segments, segment 1's head can (in principle) cross the link while
segment 2 computes -- IF the tunnel's D2H path overlaps compute.
Same shapes serve every segment (off is dynamic), so no extra
compiles.

Run: python experiments/segsplit_probe.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from lightmotif_tpu import EncodedSequence, load
    from lightmotif_tpu import scanner as scanner_mod
    from lightmotif_tpu.scanner import MultiScanner

    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    db = "/root/reference/lightmotif-io/benches/JASPAR2024.meme"
    fwd = [mo.pssm for mo in load(db, format="meme")
           if mo.pssm is not None]
    ths = [p.score_distribution().score(1e-6) for p in fwd]
    pssms = fwd + [p.reverse_complement() for p in fwd]

    # segment caps must stay multiples of the fused kernel geometry
    # unit -> powers of two; build all scanners first, then interleave
    # the timed trials A/B/C (service load swings single configs 1.5x)
    cfgs = [(None, 1 << 23), ("2seg", 1 << 22), ("5seg", 1 << 20)]
    scanners, base_hits = {}, None
    for name, seg_cap in cfgs:
        MultiScanner.SEGMENT_CAP = seg_cap  # (shipped default: 1<<22)
        ms = MultiScanner(pssms, thresholds=ths + ths)
        ids, _, _ = ms.scan_arrays(seq)   # warm (compile on first cfg)
        ms.scan_arrays(seq)               # settle sticky heads
        if base_hits is None:
            base_hits = len(ids)
        assert len(ids) == base_hits, (name, len(ids), base_hits)
        scanners[name] = ms
    # Per-config STEADY blocks: alternating scanners every trial makes
    # every reading pay a program/buffer switch (~2x the steady wall --
    # segsplit_probe3.out read 0.31 s while bench.py's single-scanner
    # loop read 0.155 s minutes earlier).  Cycle config blocks twice;
    # within a block skip the first scan (it pays the switch).
    walls = {name: [] for name, _ in cfgs}
    for _ in range(2):
        for name, _ in cfgs:
            block = []
            for _ in range(5):
                t0 = time.perf_counter()
                scanners[name].scan_arrays(seq)
                block.append(time.perf_counter() - t0)
            walls[name].extend(block[1:])
    for name, _ in cfgs:
        w = sorted(walls[name])
        print(f"{name}: hits={base_hits} best={w[0]:.4f} "
              f"median={w[len(w)//2]:.4f} all={[round(x, 3) for x in w]}",
              flush=True)


if __name__ == "__main__":
    main()
