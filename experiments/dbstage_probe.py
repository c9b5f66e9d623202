"""Per-stage device cost of the whole-database fused scan.

Replicates scan_multi_core's pipeline with a static stage cutoff and
times each prefix under the repeat_time slope protocol, so the 0.24 s
device wall decomposes into prefilter / compaction / phase C /
extraction levels / rescore+pack.
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from lightmotif_tpu import EncodedSequence, load
from lightmotif_tpu.ops import multi, multi_kernel, xla_ops
from lightmotif_tpu.scanner import MultiScanner
from tools.perf import repeat_time


def build():
    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    db = "/root/reference/lightmotif-io/benches/JASPAR2024.meme"
    fwd = [mo.pssm for mo in load(db, format="meme") if mo.pssm is not None]
    ths = [p.score_distribution().score(1e-6) for p in fwd]
    pssms = fwd + [p.reverse_complement() for p in fwd]
    ms = MultiScanner(pssms, thresholds=ths + ths)
    ids, _, _ = ms.scan_arrays(seq)
    assert len(ids) == 71730, len(ids)
    token = ms._dispatch_raw()
    e = token["entries"][0]
    g = e["group"]
    cap, cap_hits, dense = ms._group_state[0]
    chunk_len = int(ms._scan_data.shape[0])
    n_here2d = np.zeros((1, g["filt16"][0].shape[1]), np.int32)
    n_here2d[0, : g["count"]] = np.maximum(
        np.array([len(seq)], np.int64) - ms.lengths[g["ids"]] + 1, 0)
    print(f"cap={cap} cap_hits={cap_hits} dense={dense} "
          f"chunk_len={chunk_len} m_max={g['m_max']} "
          f"m_pad={g['filt16'][0].shape[1]}", flush=True)
    return ms, g, chunk_len, cap, cap_hits, dense, jnp.asarray(n_here2d)


@functools.partial(jax.jit, static_argnames=(
    "stage", "cap", "cap_hits", "m_max", "k", "dense", "widths",
    "g_rsplits"))
def core_upto(chunk, f_hi, f_lo, pssms, thresholds, n_valid_here,
              stage: int, cap: int, cap_hits: int, m_max: int, k: int,
              dense: bool, carry, widths=None, filt8=None,
              g_rsplits=None):
    f_hi = f_hi + carry * jnp.float32(1e-45)
    thresholds = thresholds + carry * jnp.float32(1e-45)
    chunk_len = chunk.shape[0]
    mcount = pssms.shape[0]
    m_pad = f_hi.shape[1]
    lanes = multi_kernel._lanes_for(k)
    rpb = multi_kernel.MAX_MK // lanes
    n_blocks = f_hi.shape[0] // multi_kernel.MAX_MK
    bpw = multi_kernel.BITS_PER_WORD
    n_words = m_pad // bpw

    if filt8 is not None:
        maxv = multi_kernel.prefilter_any8(
            chunk, filt8[0], filt8[1], filt8[2], m_max, k, widths=widths)
    else:
        maxv = multi_kernel.prefilter_any16(chunk, f_hi, f_lo, m_max, k,
                                            widths=widths)
    if stage == 1:
        return maxv
    any_mask = maxv.reshape(-1) >= 0
    pos_count, pos_idx, pos_valid = xla_ops.compact_mask(
        any_mask, cap, dense)
    if stage == 2:
        return pos_idx

    powers = np.zeros((m_pad, n_words), np.float32)
    for mo in range(m_pad):
        powers[mo, mo // bpw] = float(1 << (mo % bpw))
    pow_dev = jnp.asarray(powers, jnp.bfloat16)
    fine_hi = f_hi.astype(jnp.bfloat16)
    fine_lo = f_lo.astype(jnp.bfloat16)

    pwords = multi.pack_words(chunk)

    def phase_c(pos_blk):
        blk = pos_blk.shape[0]
        safe = jnp.clip(pos_blk, 0, chunk_len - 1)
        win = multi.gather_windows(pwords, safe, m_max)
        oh = win[:, :, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, lanes), 2)
        pad_rows = n_blocks * rpb - m_max
        if pad_rows:
            oh = jnp.pad(oh, ((0, 0), (0, pad_rows), (0, 0)))
        x = oh.reshape(blk, n_blocks * multi_kernel.MAX_MK)
        x = x.at[:, lanes - 1].set(True)
        xb = x.astype(jnp.bfloat16)
        ws = widths if widths is not None else (
            fine_hi.shape[1],) * n_blocks
        mk = multi_kernel.MAX_MK
        hi_acc = jnp.dot(xb[:, :mk], fine_hi[:mk],
                         preferred_element_type=jnp.float32)
        lo_acc = jnp.dot(xb[:, :mk], fine_lo[:mk],
                         preferred_element_type=jnp.float32)
        for b in range(1, n_blocks):
            s_b = fine_hi.shape[1] - ws[b]
            hi_acc = hi_acc.at[:, s_b:].add(jnp.dot(
                xb[:, b * mk:(b + 1) * mk],
                fine_hi[b * mk:(b + 1) * mk, s_b:],
                preferred_element_type=jnp.float32))
            lo_acc = lo_acc.at[:, s_b:].add(jnp.dot(
                xb[:, b * mk:(b + 1) * mk],
                fine_lo[b * mk:(b + 1) * mk, s_b:],
                preferred_element_type=jnp.float32))
        part = 256.0 * hi_acc + lo_acc
        mask = (part >= 0) \
            & (pos_blk[:, None] < n_valid_here[0][None, :]) \
            & (pos_blk < chunk_len)[:, None]
        wrds = jnp.dot(
            mask.astype(jnp.bfloat16), pow_dev,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        return wrds, jnp.sum(mask.astype(jnp.int32))

    blk = multi.PHASE_C_BLOCK
    while blk > 1024 and blk * m_pad > (1 << 26):
        blk //= 2
    cap_pad = -(-cap // blk) * blk
    pos_pad = pos_idx if cap_pad == cap else jnp.concatenate(
        [pos_idx, jnp.full((cap_pad - cap,), chunk_len, pos_idx.dtype)])
    n_blk = cap_pad // blk
    live = jnp.minimum(
        (pos_count.astype(jnp.int32) + blk - 1) // blk, n_blk)

    def pc_body(i, carry2):
        words_acc, pairs = carry2
        pos_b = jax.lax.dynamic_slice(pos_pad, (i * blk,), (blk,))
        wrds, cnt = phase_c(pos_b)
        words_acc = jax.lax.dynamic_update_slice(
            words_acc, wrds, (i * blk, 0))
        return words_acc, jnp.minimum(pairs + cnt, jnp.int32(1 << 30))

    words, pairs_total = jax.lax.fori_loop(
        0, live, pc_body,
        (jnp.zeros((cap_pad, n_words), jnp.int32), jnp.int32(0)))
    words = words[:cap]
    if stage == 3:
        return words

    mcount_pad = f_hi.shape[1]
    slots_r = max(64, min(256, cap_hits // 4096))
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (cap, n_words), 1)
    pcnt = jnp.sum(jax.lax.population_count(words), axis=1)
    rmax = jnp.max(pcnt)
    if stage == 4:
        return pcnt

    def ext_body(r, carry):
        remaining, lanes_out = carry
        nz = remaining != 0
        any_nz = jnp.any(nz, axis=1)
        widx = jnp.argmax(nz, axis=1).astype(jnp.int32)
        sel = lane_w == widx[:, None]
        w = jnp.max(jnp.where(sel, remaining, 0), axis=1)
        low = w & -w
        bit = jax.lax.population_count(low - 1)
        lane = jnp.where(any_nz, widx * bpw + bit, mcount)
        lanes_out = jax.lax.dynamic_update_slice(
            lanes_out, lane[:, None], (0, r))
        remaining = jnp.where(sel & any_nz[:, None],
                              remaining & (remaining - 1), remaining)
        return remaining, lanes_out

    trips = jnp.minimum(rmax, slots_r)
    _, lanes_out = jax.lax.fori_loop(
        0, trips, ext_body,
        (words, jnp.full((cap, slots_r), mcount, jnp.int32)))
    if stage == 5:
        return lanes_out

    counts_c = jnp.minimum(pcnt, slots_r)
    cs = jnp.cumsum(counts_c)
    pair_count = cs[-1]
    flat_n = cap * slots_r
    qblk = 4096
    cap_hpad = -(-cap_hits // qblk) * qblk
    q_live = jnp.minimum((pair_count + qblk - 1) // qblk,
                         cap_hpad // qblk)

    def q_body(i, out):
        q = i * qblk + jnp.arange(1, qblk + 1, dtype=jnp.int32)
        row = jnp.searchsorted(cs, q, side="left").astype(jnp.int32)
        row = jnp.minimum(row, cap - 1)
        slot = q - 1 - (cs[row] - counts_c[row])
        idx_b = row * slots_r + jnp.minimum(slot, slots_r - 1)
        return jax.lax.dynamic_update_slice(out, idx_b, (i * qblk,))

    pair_idx = jax.lax.fori_loop(
        0, q_live, q_body,
        jnp.full((cap_hpad,), flat_n, jnp.int32))[:cap_hits]
    pair_idx = jnp.where(
        jnp.arange(cap_hits) < pair_count, pair_idx, flat_n)
    safe_idx = jnp.minimum(pair_idx, flat_n - 1)
    rows = safe_idx // slots_r
    positions = jnp.where(pair_idx < flat_n, pos_idx[rows], chunk_len)
    motif_ids = jnp.minimum(
        jnp.take(lanes_out.reshape(-1), safe_idx), mcount - 1)
    if stage == 6:
        return positions

    rsplits = g_rsplits
    if rsplits is not None and m_max > rpb:
        fscores = multi.rescore_multi_staged(
            chunk, pssms, positions, motif_ids, pair_count,
            rsplits, rpb)
    else:
        fscores = multi.rescore_multi(chunk, pssms, positions,
                                      motif_ids, n_live=pair_count)
    if stage == 7:
        return fscores
    keep = (
        (pair_idx < flat_n)
        & (positions < n_valid_here[0, motif_ids])
        & (fscores >= thresholds[motif_ids])
    )
    n_kept = jnp.sum(keep.astype(jnp.int32))
    key = jnp.where(keep, pair_idx, jnp.int32(2**31 - 1))
    order = jnp.argsort(key)
    packed = jnp.stack([
        jnp.take(positions, order),
        jnp.take(motif_ids, order),
        jax.lax.bitcast_convert_type(jnp.take(fscores, order), jnp.int32),
    ])
    return packed


def main():
    ms, g, chunk_len, cap, cap_hits, dense, n_here2d = build()
    k = 5
    chunk = jax.lax.dynamic_slice(
        jnp.asarray(ms._scan_data), (0,), (chunk_len,))
    f_hi, f_lo = (x.astype(jnp.float32) for x in g["filt16"])
    args = (chunk, f_hi, f_lo, g["pssm"], g["th"], n_here2d)
    names = {1: "prefilter16", 2: "+compact(any)", 3: "+phaseC",
             4: "+lvl0", 5: "+lvl1", 6: "+lvl2", 7: "+rescore",
             8: "full(sort+pack)"}
    prev = 0.0
    for stage in sorted(names):
        def make():
            fn = lambda *a: core_upto(
                a[0], a[1], a[2], a[3], a[4], a[5],
                stage=stage, cap=cap, cap_hits=cap_hits,
                m_max=g["m_max"], k=k, dense=dense, carry=a[6],
                widths=g.get("widths"), filt8=g.get("filt8"),
                g_rsplits=g.get("rsplits"))
            return fn, args, 0
        per, spans = repeat_time(make, r_lo=1, r_hi=3, trials=3)
        print(f"stage {stage} {names[stage]:18s}: {per*1e3:8.2f} ms "
              f"(delta {max(per-prev,0)*1e3:7.2f} ms) spans={spans}",
              flush=True)
        prev = per


if __name__ == "__main__":
    main()
