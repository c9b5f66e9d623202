"""Stage accounting for the CURRENT scan_multi_core at ratcheted caps."""
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
t0=time.time(); mo, pos, sc = ms.scan_arrays(seq)
print("warm", round(time.time()-t0,1), "s,", len(mo), "hits", flush=True)
for _ in range(2):
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
    print(f"{label:46s} {best*1e3:8.1f} ms", flush=True)

# stage variants via a stop parameter replicated from scan_multi_core
def staged(stop):
    def fn(chunk, n_valid_here, filters_t, pssms, thresholds):
        chunk_len = chunk.shape[0]
        mcount = pssms.shape[0]
        m_pad = filters_t.shape[1]
        lanes = multi_kernel._lanes_for(k)
        rpb = multi_kernel.MAX_MK // lanes
        n_blocks = filters_t.shape[0] // multi_kernel.MAX_MK
        bpw = multi_kernel.BITS_PER_WORD
        n_words = m_pad // bpw
        maxv = multi_kernel.prefilter_any(chunk, filters_t, m_max, k)
        any_mask = maxv.reshape(-1) >= 0
        pos_count, pos_idx, pos_valid = xla_ops.compact_mask(any_mask, cap, dense)
        if stop == "compact": return pos_count
        powers = np.zeros((m_pad, n_words), np.float32)
        for mo_ in range(m_pad):
            powers[mo_, mo_ // bpw] = float(1 << (mo_ % bpw))
        pow_dev = jnp.asarray(powers, jnp.bfloat16)
        filt_bf = filters_t.astype(jnp.bfloat16)
        def phase_c(pos_blk):
            blk = pos_blk.shape[0]
            safe = jnp.minimum(pos_blk, chunk_len - 1)
            gidx = jnp.clip(safe[:, None] + jnp.arange(m_max)[None, :], 0, chunk_len - 1)
            win = chunk[gidx].astype(jnp.int32)
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
        blk = multi.PHASE_C_BLOCK
        cap_pad = -(-cap // blk) * blk
        pos_pad = pos_idx if cap_pad == cap else jnp.concatenate(
            [pos_idx, jnp.full((cap_pad - cap,), chunk_len, pos_idx.dtype)])
        if cap > blk:
            words, pairs_blk = jax.lax.map(phase_c, pos_pad.reshape(cap_pad // blk, blk))
            words = words.reshape(cap_pad, n_words)[:cap]
            pairs_total = jnp.sum(pairs_blk)
        else:
            words, pairs_total = phase_c(pos_idx)
        if stop == "phasec": return pairs_total
        c0 = min(cap, cap_hits)
        has_hit = jnp.any(words != 0, axis=1)
        hit_count, hrows, hvalid = xla_ops.compact_mask(has_hit, c0, dense=True)
        hsafe = jnp.minimum(hrows, cap - 1)
        hlive = hrows < cap
        words_h = jnp.where(hlive[:, None], words[hsafe], 0)
        wpos_h = jnp.where(hlive, pos_idx[hsafe], chunk_len)
        if stop == "level0": return hit_count
        wmask = (words_h != 0).reshape(-1)
        wcount, widx, wvalid = xla_ops.compact_mask(wmask, cap_hits, dense=True)
        wsafe = jnp.minimum(widx, wmask.shape[0] - 1)
        wvals = jnp.where(widx < wmask.shape[0], jnp.take(words_h.reshape(-1), wsafe), 0)
        wrow = jnp.minimum(wsafe // n_words, c0 - 1)
        wpos = wpos_h[wrow]
        wword = wsafe % n_words
        if stop == "words": return wcount
        lane16 = jax.lax.broadcasted_iota(jnp.int32, (1, bpw), 1)
        bools = ((wvals[:, None] >> lane16) & 1) != 0
        flat = bools.reshape(-1)
        pair_count, pair_idx, pair_valid = xla_ops.compact_mask(flat, cap_hits, dense=True)
        pair_idx = jnp.minimum(pair_idx, flat.shape[0])
        rows = jnp.minimum(pair_idx // bpw, cap_hits - 1)
        positions = wpos[rows]
        motif_ids = jnp.minimum(wword[rows] * bpw + pair_idx % bpw, mcount - 1)
        if stop == "pairs": return pair_count
        fscores = multi.rescore_multi(chunk, pssms, positions, motif_ids)
        if stop == "rescore": return jnp.sum(fscores)
        keep = ((pair_idx < flat.shape[0]) & (positions < n_valid_here[0, motif_ids])
                & (fscores >= thresholds[motif_ids]))
        n_kept = jnp.sum(keep.astype(jnp.int32))
        key = jnp.where(keep, pair_idx, jnp.int32(2**31 - 1))
        order = jnp.argsort(key)
        packed = jnp.stack([jnp.take(positions, order), jnp.take(motif_ids, order),
                            jax.lax.bitcast_convert_type(jnp.take(fscores, order), jnp.int32)])
        return packed[0, :4]
    return jax.jit(fn)

for stop in ("compact", "phasec", "level0", "words", "pairs", "rescore", "all"):
    f = staged(stop)
    timeit(f"through {stop}", lambda f=f: jax.device_get(
        f(data, nvd, g["filt"], g["pssm"], g["th"])))
