"""Final sort+pack stage variants (jasparfull shape: cap_hits=131072,
~81k live pairs, ~72k kept).

The shipped stage argsorts ``where(keep, pair_idx, INF)`` -- but
``pair_idx`` is ALREADY ascending (the pair compaction emits ascending
slot indices), so dropping dead entries preserves order and a
compaction can replace the full sort:

  argsort   : shipped (jnp.argsort over cap_hits keys)
  searchkth : cumsum(keep) + live-blocked searchsorted (the
              compact_mask dense path) -> take
  scatter   : dest = cumsum(keep)-1; one [3, cap]-wide scatter

Run: python experiments/sortpack_probe.py
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tools.perf import repeat_time

CAP = 131072
LIVE = 81054
KEPT_FRAC = 0.885
CHUNK_LEN = 4_718_592


@functools.partial(jax.jit, static_argnames=("variant",))
def pack_v(keep, positions, motif_ids, fscores, pair_idx, carry,
           variant: str):
    from lightmotif_tpu.ops import xla_ops

    positions = positions + carry.astype(jnp.int32)
    bits = jax.lax.bitcast_convert_type(fscores, jnp.int32)
    if variant == "argsort":
        key = jnp.where(keep, pair_idx, jnp.int32(2**31 - 1))
        order = jnp.argsort(key)
        packed = jnp.stack([
            jnp.take(positions, order),
            jnp.take(motif_ids, order),
            jnp.take(bits, order),
        ])
        n_kept = jnp.sum(keep.astype(jnp.int32))
        return packed, n_kept
    if variant == "searchkth":
        n_kept, sel, _ = xla_ops.compact_mask(keep, CAP, dense=True)
        inb = sel < CAP
        safe = jnp.minimum(sel, CAP - 1)
        packed = jnp.stack([
            jnp.where(inb, jnp.take(positions, safe), CHUNK_LEN),
            jnp.where(inb, jnp.take(motif_ids, safe), 0),
            jnp.where(inb, jnp.take(bits, safe), 0),
        ])
        return packed, n_kept
    if variant == "scatter":
        dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
        n_kept = dest[-1] + 1
        dest = jnp.where(keep, dest, CAP - 1)  # dead pile on last slot
        out = jnp.full((3, CAP), CHUNK_LEN, jnp.int32)
        vals = jnp.stack([positions, motif_ids, bits])
        # scatter columns: out[:, dest[i]] = vals[:, i] for kept i,
        # ascending dest so later (dead) writes land on the tail slot
        out = out.at[:, dest].set(
            jnp.where(keep[None, :], vals,
                      jnp.array([[CHUNK_LEN], [0], [0]], jnp.int32)))
        return out, n_kept
    raise ValueError(variant)


def main():
    rng = np.random.default_rng(0xBEEF)
    keep_live = rng.random(LIVE) < KEPT_FRAC
    keep = np.zeros(CAP, bool)
    keep[:LIVE] = keep_live
    pair_idx = np.arange(CAP, dtype=np.int32)
    positions = np.sort(
        rng.integers(0, CHUNK_LEN, size=CAP)).astype(np.int32)
    motif_ids = rng.integers(0, 2048, size=CAP).astype(np.int32)
    fscores = rng.normal(size=CAP).astype(np.float32)
    args = tuple(jnp.asarray(a) for a in
                 (keep, positions, motif_ids, fscores, pair_idx))

    want = None
    for variant in ("argsort", "searchkth", "scatter"):
        packed, n_kept = jax.device_get(
            pack_v(*args, jnp.float32(0.0), variant=variant))
        nk = int(n_kept)
        head = np.asarray(packed)[:, :nk]
        if want is None:
            want = head
            print(f"n_kept={nk}", flush=True)
        tag = ("OK " if head.shape == want.shape
               and np.array_equal(head, want) else "DIFF")
        print(f"parity[{variant}]: {tag}", flush=True)

    for variant in ("argsort", "searchkth", "scatter"):
        def make():
            fn = lambda k, p, m, f, pi, cr: pack_v(
                k, p, m, f, pi, cr, variant=variant)[0]
            return fn, args, 0
        per, spans = repeat_time(make, r_lo=8, r_hi=64, trials=3)
        print(f"{variant:10s}: {per*1e3:7.3f} ms  spans={spans}",
              flush=True)


if __name__ == "__main__":
    main()
