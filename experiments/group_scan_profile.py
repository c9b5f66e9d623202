"""Stage-level timing of one fused motif-group scan at M=1024 on the
real chip: where do the ~2 s/group of the whole-database wall go?"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp, functools

from lightmotif_tpu import load, EncodedSequence
from lightmotif_tpu.scanner import MultiScanner
from lightmotif_tpu.ops import multi, multi_kernel, xla_ops

JASPAR2024 = "/root/reference/lightmotif-io/benches/JASPAR2024.meme"
fwd = [m.pssm for m in load(JASPAR2024, format="meme") if m.pssm is not None][:1024]
ths = [p.score_distribution().score(1e-6) for p in fwd]
rng = np.random.default_rng(0xECC011)
genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
seq = EncodedSequence(genome.astype(np.uint8))

ms = MultiScanner(fwd, thresholds=ths)
t0=time.time(); mo, pos, sc = ms.scan_arrays(seq); print("warm", round(time.time()-t0,1), "s,", len(mo), "hits", flush=True)
for _ in range(3):
    t0=time.time(); ms.scan_arrays(seq); print("full rep", round(time.time()-t0,3), flush=True)
print("group_state", ms._group_state, flush=True)

# stage timings on the bound data
g = ms._dev["groups"][0]
data = ms._scan_data
k = 5
cap, dense = ms._group_state[0]
m_max = g["m_max"]
chunk_len = data.shape[0]
chunk = data

def timeit(label, fn, reps=5):
    fn()  # warm
    best = np.inf
    for _ in range(reps):
        t0=time.perf_counter(); fn(); best=min(best, time.perf_counter()-t0)
    print(f"{label:42s} {best*1e3:8.1f} ms", flush=True)

pf = jax.jit(lambda c, f: multi_kernel.prefilter_any(c, f, m_max, k))
timeit("prefilter_any only", lambda: jax.device_get(pf(chunk, g["filt"])[0, :8]))

@functools.partial(jax.jit, static_argnames=("cap","dense"))
def stage_ac(c, f, cap, dense):
    maxv = multi_kernel.prefilter_any(c, f, m_max, k)
    return xla_ops.compact_mask(maxv.reshape(-1) >= 0, cap, dense)
timeit("prefilter + any-compact", lambda: jax.device_get(stage_ac(chunk, g["filt"], cap=cap, dense=dense)[0]))

nv = np.zeros((1, g["filt"].shape[1]), np.int32)
nv[0, :g["count"]] = np.maximum(len(seq) - np.array([len(p) for p in fwd]) + 1, 0)
nvd = jnp.asarray(nv)
@functools.partial(jax.jit, static_argnames=("cap","dense"))
def stage_full(c, nvh, f, ps, th, cap, dense):
    return multi.scan_multi_core(c, nvh, f, ps, th, cap, m_max, k, dense)
timeit("full scan_multi_core", lambda: jax.device_get(stage_full(chunk, nvd, g["filt"], g["pssm"], g["th"], cap=cap, dense=dense)[0]))
print("cap", cap, "dense", dense, flush=True)
