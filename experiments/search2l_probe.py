"""Two-level k-th-set-bit search for the dense compaction.

compact_mask's dense path answers ``cap`` k-th-set-bit queries with a
blocked ``jnp.searchsorted`` over the genome-length cumsum --
~log2(4.7M) = 23 random gathers per query from a 19 MB int32 array.
Window-gather measurements (rescore_probe) showed per-gather cost
grows with table size, so a two-level search -- level 1 over a
4096-stride downsample (4.6 KB, cache-resident), level 2 a manual
12-step binary search inside one 4096 window of the full cumsum --
trades 23 big-table gathers for ~11 tiny + 12 big.

Variants (jasparfull compaction shape: 57,834 set bits over a 4.7M
mask, cap 65,536):

  blocked   : shipped (live-blocked jnp.searchsorted over csum)
  twolevel  : downsample + manual in-window binary search

Run: python experiments/search2l_probe.py
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tools.perf import repeat_time

N = 4_718_592
SET = 57_834
CAP = 65_536
QBLK = 4096
G = 4096  # level-1 stride


@functools.partial(jax.jit, static_argnames=("variant",))
def kth_v(mask, carry, variant: str):
    mask = mask ^ (carry.astype(jnp.int32) > 0)  # perturb (no-op)
    csum = jnp.cumsum(mask.astype(jnp.int32))
    count = csum[-1]
    n_blk = CAP // QBLK
    live = jnp.minimum((count + QBLK - 1) // QBLK, n_blk)
    if variant == "blocked":
        def body(i, out):
            q = i * QBLK + jnp.arange(1, QBLK + 1, dtype=jnp.int32)
            idx_b = jnp.searchsorted(csum, q, side="left")
            return jax.lax.dynamic_update_slice(
                out, idx_b.astype(jnp.int32), (i * QBLK,))
    elif variant == "twolevel":
        # level-1 table: cumsum at window ends (position (w+1)*G - 1)
        ends = csum[G - 1::G]                     # [N // G]
        n_win = ends.shape[0]

        def body(i, out):
            q = i * QBLK + jnp.arange(1, QBLK + 1, dtype=jnp.int32)
            w = jnp.searchsorted(ends, q, side="left")  # window index
            w = jnp.minimum(w, n_win - 1)
            lo = w * G                    # window [lo, lo + G)
            width = G
            while width > 1:
                width //= 2
                mid = lo + width - 1
                v = csum[jnp.minimum(mid, N - 1)]
                lo = jnp.where(v < q, mid + 1, lo)
            return jax.lax.dynamic_update_slice(
                out, lo.astype(jnp.int32), (i * QBLK,))
    else:
        raise ValueError(variant)
    idx = jax.lax.fori_loop(
        0, live, body, jnp.full((CAP,), N, jnp.int32))
    return jnp.where(jnp.arange(CAP) < count, idx, N)


def main():
    rng = np.random.default_rng(0xC0)
    mask = np.zeros(N, bool)
    mask[rng.choice(N, size=SET, replace=False)] = True
    dev = jnp.asarray(mask)

    want = np.asarray(kth_v(dev, jnp.float32(0.0), variant="blocked"))
    got = np.asarray(kth_v(dev, jnp.float32(0.0), variant="twolevel"))
    ok = np.array_equal(want, got)
    print(f"parity: {'OK' if ok else 'DIFF'} "
          f"(first diff {int(np.argmin(want == got)) if not ok else -1})",
          flush=True)

    for variant in ("blocked", "twolevel"):
        def make():
            fn = lambda m, cr: kth_v(m, cr, variant=variant)
            return fn, (dev,), 0
        per, spans = repeat_time(make, r_lo=8, r_hi=64, trials=3)
        print(f"{variant:9s}: {per*1e3:7.3f} ms  spans={spans}",
              flush=True)


if __name__ == "__main__":
    main()
