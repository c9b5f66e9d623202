"""Tail-stage timing: words/bits/rescore/sort at ratcheted caps."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from lightmotif_tpu import load, EncodedSequence
from lightmotif_tpu.scanner import MultiScanner
from lightmotif_tpu.ops import multi, multi_kernel, xla_ops
from lightmotif_tpu.ops.multi import rescore_multi

JASPAR2024 = "/root/reference/lightmotif-io/benches/JASPAR2024.meme"
fwd = [m.pssm for m in load(JASPAR2024, format="meme") if m.pssm is not None][:1024]
ths = [p.score_distribution().score(1e-6) for p in fwd]
rng = np.random.default_rng(0xECC011)
genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
seq = EncodedSequence(genome.astype(np.uint8))
ms = MultiScanner(fwd, thresholds=ths)
t0=time.time(); mo, pos, sc = ms.scan_arrays(seq)
print("warm", round(time.time()-t0,1), "s,", len(mo), "hits", flush=True)
t0=time.time(); ms.scan_arrays(seq); print("full rep", round(time.time()-t0,3), flush=True)
print("state", ms._group_state, flush=True)
g = ms._dev["groups"][0]
data = ms._scan_data
cap, cap_hits, dense = ms._group_state[0]
m_max, k = g["m_max"], 5
nv = np.zeros((1, g["filt"].shape[1]), np.int32)
nv[0, :g["count"]] = np.maximum(len(seq) - np.array([len(p) for p in fwd]) + 1, 0)
nvd = jnp.asarray(nv)

def timeit(label, fn, reps=4):
    fn()
    best = np.inf
    for _ in range(reps):
        t0=time.perf_counter(); fn(); best=min(best, time.perf_counter()-t0)
    print(f"{label:40s} {best*1e3:8.1f} ms", flush=True)

# instrument scan_multi_core by stages via early returns
import lightmotif_tpu.ops.multi as M

def make_stage(stop):
    @functools.partial(jax.jit, static_argnames=())
    def fn(c, nvh, f, ps, th):
        import types
        return M.scan_multi_core(c, nvh, f, ps, th, cap, m_max, k, dense, cap_hits)
    return fn

# cheap trick: time full, then time with rescore monkeypatched to zeros,
# then with argsort removed is hard -- instead time rescore alone:
pairs = int(len(mo) * 50)  # approximate pair count scale
posd = jnp.asarray(rng.integers(0, 4_500_000, size=cap_hits, dtype=np.int32))
mod = jnp.asarray(rng.integers(0, 1024, size=cap_hits, dtype=np.int32))
resc = jax.jit(lambda c, p, mo_, ps: rescore_multi(c, ps, p, mo_))
timeit(f"rescore_multi alone [{cap_hits}] m={m_max}",
       lambda: jax.device_get(resc(data, posd, mod, g["pssm"])[:4]))
srt = jax.jit(lambda x: jnp.argsort(x))
keys = jnp.asarray(rng.integers(0, 2**30, size=cap_hits, dtype=np.int32))
timeit(f"argsort [{cap_hits}]", lambda: jax.device_get(srt(keys)[:4]))
full = jax.jit(functools.partial(M.scan_multi_core, cap=cap, m_max=m_max, k=k,
                                 dense=dense, cap_hits=cap_hits))
timeit("full scan_multi_core",
       lambda: jax.device_get(full(data, nvd, g["filt"], g["pssm"], g["th"])[0]))
