"""Finer stage profile of one M=1024 group at the ratcheted cap."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

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
for _ in range(2):
    t0=time.time(); ms.scan_arrays(seq); print("full rep", round(time.time()-t0,3), flush=True)
print("group_state", ms._group_state, flush=True)

g = ms._dev["groups"][0]
data = ms._scan_data
k = 5
cap, cap_hits, dense = ms._group_state[0]
m_max = g["m_max"]
chunk = data
chunk_len = int(data.shape[0])
lanes = multi_kernel._lanes_for(k)

def timeit(label, fn, reps=4):
    fn()
    best = np.inf
    for _ in range(reps):
        t0=time.perf_counter(); fn(); best=min(best, time.perf_counter()-t0)
    print(f"{label:44s} {best*1e3:8.1f} ms", flush=True)

@functools.partial(jax.jit, static_argnames=("cap","dense"))
def s_compact(c, f, cap, dense):
    maxv = multi_kernel.prefilter_any(c, f, m_max, k)
    cnt, idx, val = xla_ops.compact_mask(maxv.reshape(-1) >= 0, cap, dense)
    return cnt, idx
timeit("prefilter + any-compact", lambda: jax.device_get(s_compact(chunk, g["filt"], cap=cap, dense=dense)[0]))

# phase_c alone at the ratcheted cap: reuse internals via scan_multi_core?
# easier: time a jit that runs compact then ONLY the blocked phase_c,
# returning pairs_total
from lightmotif_tpu.ops.multi import PHASE_C_BLOCK, rescore_multi

@functools.partial(jax.jit, static_argnames=("cap","dense"))
def s_phasec(c, f, nvh, cap, dense):
    maxv = multi_kernel.prefilter_any(c, f, m_max, k)
    cnt, pos_idx, val = xla_ops.compact_mask(maxv.reshape(-1) >= 0, cap, dense)
    m_pad = f.shape[1]
    rpb = multi_kernel.MAX_MK // lanes
    n_blocks = f.shape[0] // multi_kernel.MAX_MK
    n_words = m_pad // multi_kernel.BITS_PER_WORD
    powers = np.zeros((m_pad, n_words), np.float32)
    for mo_ in range(m_pad):
        powers[mo_, mo_ // 16] = float(1 << (mo_ % 16))
    pow_dev = jnp.asarray(powers, jnp.bfloat16)
    filt_bf = f.astype(jnp.bfloat16)
    def phase_c(pos_blk):
        blk = pos_blk.shape[0]
        safe = jnp.minimum(pos_blk, chunk_len - 1)
        gidx = jnp.clip(safe[:, None] + jnp.arange(m_max)[None, :], 0, chunk_len - 1)
        win = c[gidx].astype(jnp.int32)
        oh = win[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, lanes), 2)
        pad_rows = n_blocks * rpb - m_max
        if pad_rows:
            oh = jnp.pad(oh, ((0, 0), (0, pad_rows), (0, 0)))
        x = oh.reshape(blk, n_blocks * multi_kernel.MAX_MK)
        x = x.at[:, lanes - 1].set(True)
        part = jnp.dot(x.astype(jnp.bfloat16), filt_bf, preferred_element_type=jnp.float32)
        mask = (part >= 0) & (pos_blk < chunk_len)[:, None]
        wrds = jnp.dot(mask.astype(jnp.bfloat16), pow_dev, preferred_element_type=jnp.float32).astype(jnp.int32)
        return wrds, jnp.sum(mask.astype(jnp.int32))
    blk = PHASE_C_BLOCK
    cap_pad = -(-cap // blk) * blk
    pos_pad = pos_idx if cap_pad == cap else jnp.concatenate(
        [pos_idx, jnp.full((cap_pad - cap,), chunk_len, pos_idx.dtype)])
    if cap > blk:
        words, pairs_blk = jax.lax.map(phase_c, pos_pad.reshape(cap_pad // blk, blk))
        return jnp.sum(pairs_blk)
    w, p = phase_c(pos_idx)
    return p
nv = np.zeros((1, g["filt"].shape[1]), np.int32)
nv[0, :g["count"]] = np.maximum(len(seq) - np.array([len(p) for p in fwd]) + 1, 0)
timeit("... + blocked phase_c (words matmuls)", lambda: jax.device_get(s_phasec(chunk, g["filt"], jnp.asarray(nv), cap=cap, dense=dense)))

@functools.partial(jax.jit, static_argnames=("cap","cap_hits","dense"))
def s_full(c, nvh, f, ps, th, cap, cap_hits, dense):
    return multi.scan_multi_core(c, nvh, f, ps, th, cap, m_max, k, dense, cap_hits)
timeit("full scan_multi_core", lambda: jax.device_get(s_full(chunk, jnp.asarray(nv), g["filt"], g["pssm"], g["th"], cap=cap, cap_hits=cap_hits, dense=dense)[0]))
print("cap", cap, "cap_hits", cap_hits, "dense", dense, flush=True)
