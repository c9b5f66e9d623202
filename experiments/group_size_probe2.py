"""Re-sweep GROUP_MOTIFS on whole-JASPAR x 2 strands now that
unreachable pruning leaves 2038 live motifs (the 512 optimum predates
pruning, the u16 first pass, and the live-block loops)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from lightmotif_tpu import load, EncodedSequence
from lightmotif_tpu.scanner import MultiScanner

gm = int(sys.argv[1])
MultiScanner.GROUP_MOTIFS = gm

JASPAR2024 = "/root/reference/lightmotif-io/benches/JASPAR2024.meme"
fwd = [m.pssm for m in load(JASPAR2024, format="meme") if m.pssm is not None]
ths = [p.score_distribution().score(1e-6) for p in fwd]
pssms = fwd + [p.reverse_complement() for p in fwd]
rng = np.random.default_rng(0xECC011)
seq = EncodedSequence(
    rng.integers(0, 4, size=4_641_652, dtype=np.int8).astype(np.uint8))
ms = MultiScanner(pssms, thresholds=ths + ths)
mo, _, _ = ms.scan_arrays(seq)
best = np.inf
for _ in range(4):
    t0 = time.perf_counter(); ms.scan_arrays(seq)
    best = min(best, time.perf_counter() - t0)
print(f"GROUP_MOTIFS={gm}: best {best:.3f} s, {len(mo)} hits, "
      f"state {ms._group_state}", flush=True)
