"""Per-group wall + stage decomposition of the CURRENT jasparfull scan
(u16 first pass + u16 phase C + live-block loops)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lightmotif_tpu import load, EncodedSequence
from lightmotif_tpu.scanner import MultiScanner
from lightmotif_tpu.ops import multi

JASPAR2024 = "/root/reference/lightmotif-io/benches/JASPAR2024.meme"
fwd = [m.pssm for m in load(JASPAR2024, format="meme") if m.pssm is not None]
ths = [p.score_distribution().score(1e-6) for p in fwd]
pssms = fwd + [p.reverse_complement() for p in fwd]
thsall = ths + ths
rng = np.random.default_rng(0xECC011)
genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
seq = EncodedSequence(genome.astype(np.uint8))

ms = MultiScanner(pssms, thresholds=thsall)
t0 = time.perf_counter(); mo, pos, sc = ms.scan_arrays(seq)
print(f"warm {time.perf_counter()-t0:.1f} s, {len(mo)} hits", flush=True)
best = np.inf
for _ in range(3):
    t0 = time.perf_counter(); ms.scan_arrays(seq)
    best = min(best, time.perf_counter() - t0)
print(f"full rep best {best:.3f} s", flush=True)
print("group_state", ms._group_state, flush=True)
groups = ms._dev["groups"]
print("groups:", [(g["count"], g["m_max"]) for g in groups], flush=True)

# per-group isolated wall: dispatch+fetch with only that group live by
# re-running the scan with a scanner whose motif subset is one group
lens = np.array([len(p) for p in pssms])
order = np.argsort(lens, kind="stable")
for s in range(0, len(pssms), MultiScanner.GROUP_MOTIFS):
    ids = order[s:s + MultiScanner.GROUP_MOTIFS]
    sub = MultiScanner([pssms[i] for i in ids],
                       thresholds=[thsall[i] for i in ids])
    sub.scan_arrays(seq)  # warm + ratchet
    bb = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); mo2, _, _ = sub.scan_arrays(seq)
        bb = min(bb, time.perf_counter() - t0)
    print(f"group {s//MultiScanner.GROUP_MOTIFS}: m<= {lens[ids].max()}"
          f" wall {bb:.3f} s hits {len(mo2)} state {sub._group_state}",
          flush=True)
