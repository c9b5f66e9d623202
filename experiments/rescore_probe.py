"""Attribute the exact-rescore stage's 40 ms and sweep block sizes.

Variants on the production pair set (jasparfull steady state:
~81k pairs, m_bucket 33, cap_hits 131072):

  base      -- rescore_multi as shipped (RESCORE_BLOCK = 4096)
  blk8k/16k -- same with larger live blocks (fewer loop iterations)
  sym_only  -- window symbol gather + adds, no PSSM value gather
  val_only  -- PSSM value gather + adds with a constant symbol
  nogather  -- adds only (loop + slice overhead floor)
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from lightmotif_tpu import EncodedSequence, load
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
    ids, pos, _ = ms.scan_arrays(seq)
    assert len(ids) == 71730, len(ids)
    g = ms._dev["groups"][0]
    cap, cap_hits, dense = ms._group_state[0]
    # reconstruct a realistic pair set: the final hits plus ~13% decoys
    n_pairs = int(len(ids) * 1.13)
    gpos = np.asarray(pos, np.int64)
    # map database ids -> group lanes
    lane_of = {int(i): lane for lane, i in enumerate(g["ids"])}
    glane = np.array([lane_of[int(i)] for i in ids], np.int32)
    extra = n_pairs - len(ids)
    pos_all = np.concatenate([gpos, gpos[:extra]]).astype(np.int32)
    mo_all = np.concatenate([glane, glane[:extra]])
    order = np.argsort(pos_all, kind="stable")
    pos_all, mo_all = pos_all[order], mo_all[order]
    pad = cap_hits - n_pairs
    pos_pad = np.concatenate([pos_all, np.zeros(pad, np.int32)])
    mo_pad = np.concatenate([mo_all, np.zeros(pad, np.int32)])
    chunk = jnp.asarray(ms._scan_data)[: int(ms._scan_data.shape[0])]
    print(f"pairs={n_pairs} cap_hits={cap_hits} m={g['m_max']}",
          flush=True)
    return (chunk, g["pssm"], jnp.asarray(pos_pad), jnp.asarray(mo_pad),
            np.int32(n_pairs))


@functools.partial(jax.jit, static_argnames=("blk", "variant"))
def rescore_variant(chunk, pssms, positions, motif_ids, n_live, carry,
                    blk: int, variant: str):
    # perturb so reps are not cached (carry is f32 zero at runtime)
    positions = positions + carry.astype(jnp.int32)
    m_max = pssms.shape[1]
    k = pssms.shape[2]
    lp = chunk.shape[0]
    jj = jnp.arange(m_max, dtype=jnp.int32)
    flat = pssms.reshape(-1)

    def block(args):
        pos_b, mo_b = args
        if variant == "nogather":
            acc = pos_b.astype(jnp.float32)
            for j in range(1, m_max):
                acc = acc + jnp.float32(j)
            return acc
        gidx = jnp.clip(pos_b[:, None] + jj[None, :], 0, lp - 1)
        if variant == "sym_only":
            sym = chunk[gidx].astype(jnp.float32)
            acc = sym[:, 0]
            for j in range(1, m_max):
                acc = acc + sym[:, j]
            return acc
        if variant == "val_only":
            base = mo_b.astype(jnp.int32) * (m_max * k)
            val = flat[base[:, None] + jj[None, :] * k]
            acc = val[:, 0]
            for j in range(1, m_max):
                acc = acc + val[:, j]
            return acc
        if variant == "slice_gather":
            from lightmotif_tpu.ops import multi as _m
            words = _m.pack_words(chunk)
            safe = jnp.clip(pos_b, 0, lp - 1)
            sym = _m.gather_windows(words, safe, m_max)
            base = mo_b.astype(jnp.int32) * (m_max * k)
            table = jax.vmap(
                lambda b: jax.lax.dynamic_slice(flat, (b,), (m_max * k,))
            )(base)  # [blk, m*k] contiguous per-pair slice
            acc = None
            for j in range(m_max):
                v = table[:, j * k + k - 1]
                for s in range(k - 2, -1, -1):
                    v = jnp.where(sym[:, j] == s, table[:, j * k + s], v)
                acc = v if acc is None else acc + v
            return acc
        if variant == "packed_base":
            from lightmotif_tpu.ops import multi as _m
            words = _m.pack_words(chunk)
            safe = jnp.clip(pos_b, 0, lp - 1)
            sym = _m.gather_windows(words, safe, m_max)
            base = mo_b.astype(jnp.int32) * (m_max * k)
            val = flat[base[:, None] + jj[None, :] * k + sym]
            acc = val[:, 0]
            for j in range(1, m_max):
                acc = acc + val[:, j]
            return acc
        sym = chunk[gidx].astype(jnp.int32)
        base = mo_b.astype(jnp.int32) * (m_max * k)
        val = flat[base[:, None] + jj[None, :] * k + sym]
        acc = val[:, 0]
        for j in range(1, m_max):
            acc = acc + val[:, j]
        return acc

    cap = positions.shape[0]
    cap_pad = -(-cap // blk) * blk
    pos_p = positions if cap_pad == cap else jnp.concatenate(
        [positions, jnp.zeros((cap_pad - cap,), positions.dtype)])
    mo_p = motif_ids if cap_pad == cap else jnp.concatenate(
        [motif_ids, jnp.zeros((cap_pad - cap,), motif_ids.dtype)])
    n_blk = cap_pad // blk
    live = jnp.minimum((n_live + blk - 1) // blk, n_blk)

    def body(i, out):
        pos_b = jax.lax.dynamic_slice(pos_p, (i * blk,), (blk,))
        mo_b = jax.lax.dynamic_slice(mo_p, (i * blk,), (blk,))
        return jax.lax.dynamic_update_slice(
            out, block((pos_b, mo_b)), (i * blk,))

    out = jax.lax.fori_loop(
        0, live, body, jnp.zeros((cap_pad,), jnp.float32))
    return out[0]


def main():
    chunk, pssms, pos, mo, n_live = build()
    for variant in ("packed_base", "slice_gather"):
        for blk in ((4096,)):
            def make():
                fn = lambda c, p, po, m, cr: rescore_variant(
                    c, p, po, m, n_live, cr, blk=blk, variant=variant)
                return fn, (chunk, pssms, pos, mo), 0
            per, spans = repeat_time(make, r_lo=4, r_hi=16, trials=3)
            print(f"{variant:9s} blk={blk:6d}: {per*1e3:7.2f} ms "
                  f"spans={spans}", flush=True)


if __name__ == "__main__":
    main()
