"""Device-seconds of ONE motif-group scan vs the wall: locates the gap
between the 0.7 s whole-database wall and the sum of in-jit group
costs (dispatch overhead? transfers? device math?)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lightmotif_tpu import load, EncodedSequence
from lightmotif_tpu.scanner import MultiScanner
from lightmotif_tpu.ops import multi
from tools.perf import repeat_time

JASPAR2024 = "/root/reference/lightmotif-io/benches/JASPAR2024.meme"
fwd = [m.pssm for m in load(JASPAR2024, format="meme") if m.pssm is not None]
ths = [p.score_distribution().score(1e-6) for p in fwd]
pssms = fwd + [p.reverse_complement() for p in fwd]
thsall = ths + ths
rng = np.random.default_rng(0xECC011)
genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
seq = EncodedSequence(genome.astype(np.uint8))

ms = MultiScanner(pssms, thresholds=thsall)
ms.scan_arrays(seq)  # warm: pack, compile, ratchets
best = np.inf
for _ in range(3):
    t0 = time.perf_counter(); ms.scan_arrays(seq)
    best = min(best, time.perf_counter() - t0)
print(f"full wall {best:.3f} s", flush=True)

# dispatch-only wall (async queue): how long until dispatch returns
t0 = time.perf_counter(); tok = ms.dispatch()
t_disp = time.perf_counter() - t0
ms.fetch(tok)
print(f"dispatch-only wall {t_disp*1e3:.1f} ms", flush=True)

# per-group in-jit device time (repetition slope): the fused core on
# the same chunk, counts[2] as the probe
data = ms._scan_data
k = 5
dseq = ms._dseq
n_valid = np.maximum(dseq.length - ms.lengths + 1, 0).astype(np.int32)
for gi, g in enumerate(ms._dev["groups"]):
    cap, cap_hits, dense = ms._group_state.get(gi, (65536, 65536, True))
    n2d = np.zeros((1, g["filt16"][0].shape[1]), np.int32)
    n2d[0, :g["count"]] = n_valid[g["ids"]]
    n2d_dev = jnp.asarray(n2d)
    chunk_len = data.shape[0]

    def mk():
        def fn(seqd, nv, f_hi, f_lo, pssm, th, carry):
            chunk = seqd  # whole buffer, single segment
            counts, _ = multi.scan_multi_core(
                chunk, nv + (carry.astype(jnp.int32) * 0)[None, None],
                None, pssm, th, cap, g["m_max"], k, dense, cap_hits,
                (f_hi, f_lo))
            return counts.astype(jnp.float32)
        return fn, (data, n2d_dev, g["filt16"][0], g["filt16"][1],
                    g["pssm"], g["th"]), 2
    per, spans = repeat_time(mk, r_lo=1, r_hi=9, trials=3)
    print(f"group {gi} (count {g['count']}, m {g['m_max']}): "
          f"{float(per)*1e3:.1f} ms device  spans {spans}", flush=True)
