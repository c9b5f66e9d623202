"""GROUP_MOTIFS sweep for the whole-database scan AFTER the u16
any-prefilter: the u8 prefilter's union saturation forced 512-motif
groups; at u16 resolution candidates sit near true-hit density, so
bigger groups should amortize the per-group fixed costs (compaction,
phase C setup, counter fetch).

Run on the real chip:  python experiments/group_sweep16.py [sizes...]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from lightmotif_tpu import load, EncodedSequence
from lightmotif_tpu.scanner import MultiScanner

JASPAR2024 = "/root/reference/lightmotif-io/benches/JASPAR2024.meme"
sizes = [int(a) for a in sys.argv[1:]] or [512, 1024, 2048, 8192]

t0 = time.perf_counter()
fwd = [m.pssm for m in load(JASPAR2024, format="meme")
       if m.pssm is not None]
ths = [p.score_distribution().score(1e-6) for p in fwd]
pssms = fwd + [p.reverse_complement() for p in fwd]
thsall = ths + ths
print(f"prep {time.perf_counter()-t0:.1f}s, {len(pssms)} matrices",
      flush=True)

rng = np.random.default_rng(0xECC011)
genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
seq = EncodedSequence(genome.astype(np.uint8))

want = None
for gs in sizes:
    MultiScanner.GROUP_MOTIFS = gs
    ms = MultiScanner(pssms, thresholds=thsall)
    t0 = time.perf_counter()
    mo, pos, sc = ms.scan_arrays(seq)  # warm: pack/upload/compile
    warm = time.perf_counter() - t0
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        mo, pos, sc = ms.scan_arrays(seq)
        walls.append(time.perf_counter() - t0)
    n = len(mo)
    if want is None:
        want = n
    print(f"GROUP_MOTIFS={gs:5d}: warm {warm:6.1f}s  steady "
          f"{min(walls):6.3f}s  hits {n}  state "
          f"{dict(list(ms._group_state.items())[:4])}"
          f"{' MISMATCH!' if n != want else ''}", flush=True)
