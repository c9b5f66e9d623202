"""Round-5 rescore levers (VERDICT item 3): attack the two gather
streams that split the 30-43 ms exact-rescore stage ~50/50.

Measured base (rescore_probe.out, jasparfull pair set: ~81k pairs,
m_bucket=33, cap_hits=131072):

  sym_only (window stream)  22.8 ms  -- 9 word reads via ONE [n, 9]
                                        batched gather  (2.5 ms/read)
  val_only (PSSM stream)    20.6 ms  -- 33 flat [n] gathers
                                        (0.62 ms/gather)

The batched 2-D gather is ~4x costlier per element than a flat [n]
gather, so the first lever is purely structural.  Variants:

  packed_base  shipped rescore (one [n,9] window gather + 33 flat)
  win_flat     window words as 9 SEPARATE flat gathers words[w0+k]
  win_nib      4-bit nibble packing (8 symbols/word): 5 flat gathers
  val_pair     PSSM values from a [M, m/2, K, K] pair table holding
               (t_2j, t_2j+1) as TWO f32 planes -> 2 gathers per pair
               = same count as base (control; shows plane split cost)
  val_pair64   same pair table packed as ONE 64-bit word per entry,
               fetched with a single gather per row pair (17 vs 33)
               under jax.experimental.enable_x64; exact f32 halves
               recover by bit split, so sequential-order adds (and
               bit parity) are PRESERVED -- unlike pairsum_probe's
               pairwise association, this only batches the FETCH
  prefix4      first 4 rows' exact sequential prefix from a [M, 625]
               table (code = ((s0*5+s1)*5+s2)*5+s3), then 29 flat
               gathers -- order-preserving by construction

Run: python experiments/rescore_probe3.py
"""
import functools
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from tools.perf import repeat_time

from rescore_probe import build  # noqa: E402  (same pair-set harness)


def win_words_flat(words, safe, m_max, nib=False):
    """Window symbols via SEPARATE flat word gathers (+ select unpack).

    nib=False: int32 words of 4 byte-symbols ((m+6)//4 reads).
    nib=True : int32 words of 8 nibble-symbols ((m+14)//8 reads).
    """
    spw = 8 if nib else 4
    n_words = (m_max + spw + spw - 2) // spw
    w0 = jnp.minimum(safe // spw, words.shape[0] - n_words)
    w = [words[w0 + k] for k in range(n_words)]  # n_words FLAT gathers
    r = safe - w0 * spw
    cols = []
    shift_bits = 2 if nib else 3
    mask = 15 if nib else 255
    for j in range(m_max):
        off = r + j
        wi = off >> (3 if nib else 2)
        sel = w[0]
        for c in range(1, n_words):
            sel = jnp.where(wi == c, w[c], sel)
        cols.append((sel >> ((off & (spw - 1)) << shift_bits)) & mask)
    return cols


def pack_nibbles(chunk):
    lp = chunk.shape[0]
    pad = (-lp) % 8
    s = chunk if not pad else jnp.concatenate(
        [chunk, jnp.zeros((pad,), chunk.dtype)])
    b = s.astype(jnp.int32).reshape(-1, 8)
    out = b[:, 0]
    for i in range(1, 8):
        out = out | (b[:, i] << (4 * i))
    return out


@functools.partial(jax.jit, static_argnames=("blk", "variant"))
def rescore_v(chunk, pssms, pair64, pair32, pre4, positions, motif_ids,
              n_live, carry, blk: int, variant: str):
    positions = positions + carry.astype(jnp.int32)
    m_max = pssms.shape[1]
    k = pssms.shape[2]
    lp = chunk.shape[0]
    jj = jnp.arange(m_max, dtype=jnp.int32)
    flat = pssms.reshape(-1)
    from lightmotif_tpu.ops import multi as _m
    words = _m.pack_words(chunk)
    nwords = pack_nibbles(chunk)
    n_pair = m_max // 2

    def block(args):
        pos_b, mo_b = args
        safe = jnp.clip(pos_b, 0, lp - 1)
        if variant == "packed_base":
            sym = _m.gather_windows(words, safe, m_max)
            base = mo_b.astype(jnp.int32) * (m_max * k)
            val = flat[base[:, None] + jj[None, :] * k + sym]
            acc = val[:, 0]
            for j in range(1, m_max):
                acc = acc + val[:, j]
            return acc
        if variant in ("win_flat", "win_nib"):
            cols = win_words_flat(words if variant == "win_flat"
                                  else nwords, safe, m_max,
                                  nib=variant == "win_nib")
            base = mo_b.astype(jnp.int32) * (m_max * k)
            acc = None
            for j in range(m_max):
                v = flat[base + j * k + cols[j]]
                acc = v if acc is None else acc + v
            return acc
        cols = win_words_flat(words, safe, m_max)
        if variant in ("val_pair", "val_pair64"):
            basep = mo_b.astype(jnp.int32) * (n_pair * k * k)
            acc = None
            for jp in range(n_pair):
                code = basep + jp * (k * k) + cols[2 * jp] * k \
                    + cols[2 * jp + 1]
                if variant == "val_pair64":
                    w64 = pair64[code]
                    lo = jax.lax.convert_element_type(
                        w64 & jnp.uint64(0xFFFFFFFF), jnp.uint32)
                    hi = jax.lax.convert_element_type(
                        w64 >> jnp.uint64(32), jnp.uint32)
                    va = jax.lax.bitcast_convert_type(lo, jnp.float32)
                    vb = jax.lax.bitcast_convert_type(hi, jnp.float32)
                else:
                    va = pair32[0, code]
                    vb = pair32[1, code]
                acc = va if acc is None else acc + va
                acc = acc + vb
            if m_max % 2:
                base = mo_b.astype(jnp.int32) * (m_max * k)
                acc = acc + flat[base + (m_max - 1) * k
                                 + cols[m_max - 1]]
            return acc
        if variant == "prefix4":
            code = ((cols[0] * k + cols[1]) * k + cols[2]) * k + cols[3]
            acc = pre4[mo_b.astype(jnp.int32) * (k ** 4) + code]
            base = mo_b.astype(jnp.int32) * (m_max * k)
            for j in range(4, m_max):
                acc = acc + flat[base + j * k + cols[j]]
            return acc
        raise ValueError(variant)

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
    return out


def main():
    import contextlib
    chunk, pssms, pos, mo, n_live = build()
    m_max = int(pssms.shape[1])
    k = int(pssms.shape[2])
    M = int(pssms.shape[0])
    n_pair = m_max // 2
    pm = np.asarray(pssms, np.float32)  # [M, m, k]

    # pair tables: entry (mo, jp, a, b) = (t[2jp][a], t[2jp+1][b])
    pa = np.repeat(pm[:, 0:2 * n_pair:2, :, None], k, axis=3)
    pb = np.repeat(pm[:, 1:2 * n_pair:2, None, :], k, axis=2)
    pair32 = np.stack([pa.reshape(M * n_pair * k * k),
                       pb.reshape(M * n_pair * k * k)])
    p64 = (pa.reshape(-1).view(np.uint32).astype(np.uint64)
           | (pb.reshape(-1).view(np.uint32).astype(np.uint64) << 32))

    # prefix-4 table: exact sequential f32 prefix of rows 0..3
    codes = np.arange(k ** 4)
    s0, rem = np.divmod(codes, k ** 3)
    s1, rem = np.divmod(rem, k ** 2)
    s2, s3 = np.divmod(rem, k)
    pre = pm[:, 0, :][:, s0].astype(np.float32)
    for j, sj in ((1, s1), (2, s2), (3, s3)):
        pre = pre + pm[:, j, :][:, sj]
    pre4 = jnp.asarray(pre.reshape(-1))

    pair32 = jnp.asarray(pair32)

    @contextlib.contextmanager
    def enable_x64():
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    with enable_x64():
        pair64 = jax.device_put(p64)

    def ctx_for(variant):
        return (enable_x64() if variant == "val_pair64"
                else contextlib.nullcontext())

    nl = int(n_live)
    want = np.asarray(rescore_v(
        chunk, pssms, pair64, pair32, pre4, pos, mo, n_live,
        jnp.float32(0.0), blk=4096, variant="packed_base"))[:nl]
    for variant in ("win_flat", "win_nib", "val_pair", "val_pair64",
                    "prefix4"):
        try:
            with ctx_for(variant):
                got = np.asarray(rescore_v(
                    chunk, pssms, pair64, pair32, pre4, pos, mo,
                    n_live, jnp.float32(0.0), blk=4096,
                    variant=variant))[:nl]
            mism = int(np.count_nonzero(
                got.view(np.int32) != want.view(np.int32)))
            print(f"parity[{variant}]: {mism} / {nl} mismatches",
                  flush=True)
        except Exception as e:
            print(f"parity[{variant}]: ERROR {repr(e)[:200]}",
                  flush=True)

    for variant in ("packed_base", "win_flat", "win_nib", "val_pair",
                    "val_pair64", "prefix4"):
        try:
            def make():
                fn = lambda c, p, p6, p3, p4, po, m, cr: rescore_v(
                    c, p, p6, p3, p4, po, m, n_live, cr, blk=4096,
                    variant=variant)
                return fn, (chunk, pssms, pair64, pair32, pre4, pos,
                            mo), 0
            with ctx_for(variant):
                per, spans = repeat_time(make, r_lo=4, r_hi=24,
                                         trials=3)
            print(f"{variant:12s}: {per*1e3:7.2f} ms  spans={spans}",
                  flush=True)
        except Exception as e:
            print(f"{variant:12s}: ERROR {repr(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
