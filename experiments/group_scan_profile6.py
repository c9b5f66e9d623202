"""Stage accounting of the CURRENT u16 scan_multi_core on a real
512-motif JASPAR group (post unreachable-pruning): where do the ~77 ms
of device time per group go?"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lightmotif_tpu import load, EncodedSequence
from lightmotif_tpu.scanner import MultiScanner
from lightmotif_tpu.ops import multi, multi_kernel, xla_ops
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
ms.scan_arrays(seq)
data = ms._scan_data
g = ms._dev["groups"][0]
cap, cap_hits, dense = ms._group_state.get(0, (65536, 65536, True))
k = 5
n_valid = np.maximum(ms._dseq.length - ms.lengths + 1, 0).astype(np.int32)
n2d = np.zeros((1, g["filt16"][0].shape[1]), np.int32)
n2d[0, :g["count"]] = n_valid[g["ids"]]
n2d_dev = jnp.asarray(n2d)
m_max = g["m_max"]

STAGES = ("prefilter", "compact", "phasec", "level0", "words", "pairs",
          "rescore", "all")


def staged(stop):
    filters_fine = g["filt16"]
    pssms_d, thresholds = g["pssm"], g["th"]
    chunk_len = data.shape[0]
    mcount = pssms_d.shape[0]
    m_pad = filters_fine[0].shape[1]
    lanes = multi_kernel._lanes_for(k)
    rpb = multi_kernel.MAX_MK // lanes
    n_blocks = filters_fine[0].shape[0] // multi_kernel.MAX_MK
    bpw = multi_kernel.BITS_PER_WORD
    n_words = m_pad // bpw

    def fn(chunk, n_valid_here, f_hi, f_lo, carry):
        nvh = n_valid_here + (carry.astype(jnp.int32) * 0)[None, None]
        maxv = multi_kernel.prefilter_any16(chunk, f_hi, f_lo, m_max, k)
        if stop == "prefilter":
            return maxv.reshape(-1)[:4].astype(jnp.float32)
        any_mask = maxv.reshape(-1) >= 0
        pos_count, pos_idx, pos_valid = xla_ops.compact_mask(
            any_mask, cap, dense)
        if stop == "compact":
            return pos_count[None].astype(jnp.float32)
        powers = np.zeros((m_pad, n_words), np.float32)
        for mo_ in range(m_pad):
            powers[mo_, mo_ // bpw] = float(1 << (mo_ % bpw))
        pow_dev = jnp.asarray(powers, jnp.bfloat16)
        fine_hi = f_hi.astype(jnp.bfloat16)
        fine_lo = f_lo.astype(jnp.bfloat16)

        def phase_c(pos_blk):
            blk = pos_blk.shape[0]
            safe = jnp.minimum(pos_blk, chunk_len - 1)
            gidx = jnp.clip(
                safe[:, None] + jnp.arange(m_max)[None, :], 0,
                chunk_len - 1)
            win = chunk[gidx].astype(jnp.int32)
            oh = win[:, :, None] == jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, lanes), 2)
            pad_rows = n_blocks * rpb - m_max
            if pad_rows:
                oh = jnp.pad(oh, ((0, 0), (0, pad_rows), (0, 0)))
            x = oh.reshape(blk, n_blocks * multi_kernel.MAX_MK)
            x = x.at[:, lanes - 1].set(True)
            xb = x.astype(jnp.bfloat16)
            part = 256.0 * jnp.dot(
                xb, fine_hi, preferred_element_type=jnp.float32,
            ) + jnp.dot(xb, fine_lo, preferred_element_type=jnp.float32)
            mask = (part >= 0) \
                & (pos_blk[:, None] < nvh[0][None, :]) \
                & (pos_blk < chunk_len)[:, None]
            wrds = jnp.dot(
                mask.astype(jnp.bfloat16), pow_dev,
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            return wrds, jnp.sum(mask.astype(jnp.int32))

        words, pairs_total = phase_c(pos_idx)  # cap == one block here
        if stop == "phasec":
            return pairs_total[None].astype(jnp.float32)
        c0 = min(cap, cap_hits)
        has_hit = jnp.any(words != 0, axis=1)
        hit_count, hrows, hvalid = xla_ops.compact_mask(
            has_hit, c0, dense=True)
        hsafe = jnp.minimum(hrows, cap - 1)
        hlive = hrows < cap
        words_h = jnp.where(hlive[:, None], words[hsafe], 0)
        wpos_h = jnp.where(hlive, pos_idx[hsafe], chunk_len)
        if stop == "level0":
            return hit_count[None].astype(jnp.float32)
        wmask = (words_h != 0).reshape(-1)
        wcount, widx, wvalid = xla_ops.compact_mask(
            wmask, cap_hits, dense=True)
        wsafe = jnp.minimum(widx, wmask.shape[0] - 1)
        wvals = jnp.where(widx < wmask.shape[0],
                          jnp.take(words_h.reshape(-1), wsafe), 0)
        wrow = jnp.minimum(wsafe // n_words, c0 - 1)
        wpos = wpos_h[wrow]
        wword = wsafe % n_words
        if stop == "words":
            return wcount[None].astype(jnp.float32)
        lane16 = jax.lax.broadcasted_iota(jnp.int32, (1, bpw), 1)
        bools = ((wvals[:, None] >> lane16) & 1) != 0
        flat = bools.reshape(-1)
        pair_count, pair_idx, pair_valid = xla_ops.compact_mask(
            flat, cap_hits, dense=True)
        pair_idx = jnp.minimum(pair_idx, flat.shape[0])
        rows = jnp.minimum(pair_idx // bpw, cap_hits - 1)
        positions = wpos[rows]
        motif_ids = jnp.minimum(wword[rows] * bpw + pair_idx % bpw,
                                mcount - 1)
        if stop == "pairs":
            return pair_count[None].astype(jnp.float32)
        fscores = multi.rescore_multi(chunk, pssms_d, positions,
                                      motif_ids, n_live=pair_count)
        if stop == "rescore":
            return jnp.sum(fscores)[None]
        keep = ((pair_idx < flat.shape[0])
                & (positions < nvh[0, motif_ids])
                & (fscores >= thresholds[motif_ids]))
        n_kept = jnp.sum(keep.astype(jnp.int32))
        key = jnp.where(keep, pair_idx, jnp.int32(2 ** 31 - 1))
        order = jnp.argsort(key)
        packed = jnp.stack([
            jnp.take(positions, order), jnp.take(motif_ids, order),
            jax.lax.bitcast_convert_type(jnp.take(fscores, order),
                                         jnp.int32)])
        return (packed[0, :2] + n_kept)[: 2].astype(jnp.float32)

    return fn


for stop in STAGES:
    fn = staged(stop)

    def mk():
        return fn, (data, n2d_dev, g["filt16"][0], g["filt16"][1]), 0

    per, spans = repeat_time(mk, r_lo=1, r_hi=9, trials=3)
    print(f"through {stop:10s} {float(per)*1e3:8.1f} ms  spans "
          f"{ {r: round(v, 3) for r, v in spans.items()} }", flush=True)
