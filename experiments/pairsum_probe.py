"""Adversarial probe of the 36 Gpos/s bit-exact floor: paired-symbol
row batching (round-4 VERDICT item 2).

The proposal: precompute pair codes ``c[p] = s[p] * K + s[p+1]`` (one
roll + mul-add), then per PAIR of motif rows gather the two-term sum
from a K^2-column table and add -- halving the m-1 cross-lane
alignments that set the derived floor (DESIGN.md 3.1).  Two independent
arguments decide it:

**1. Parity (host, conclusive).**  A pair-table entry can hold the
exact f32 of ``t_{2j} + t_{2j+1}``, but the accumulation then becomes
``((p0 + p1) + p2) ...`` -- a DIFFERENT association than the mandated
sequential ``((((t0+t1)+t2)+t3)+...`` (reference ``pli/mod.rs:96-105``,
``avx2.rs:101-199``; contract 1 in DESIGN.md).  f32 addition is not
associative, so the two disagree wherever intermediate roundings
differ; this script counts exact-bit mismatches over every E.coli-size
bench-genome window.  Only the FIRST chunk's association survives
precomputation (its table entry IS the sequential prefix) -- that
order-preserving variant (prefix-chunk tables) is verified mismatch-
free here and is usable in the pair rescore, but it removes table
lookups, not alignments, so it cannot attack the roll-bound floor.

**2. Cost (device, on the kernel's exact geometry).**  Even granting
parity, the pair lookup needs a 25-entry table (K=5 squared); a TPU
sublane gather spans 8 sublanes, so a 25-entry lookup costs
ceil(25/8) = 4 gather groups + 3 range selects per pair step (the
protein-path construction, kernels.py) -- vs ONE gather per row in the
shipped kernel.  Skeleton kernels measure the per-step structure:

  single : 14 x (roll(1)  + 1 gather + add)   == shipped kernel shape
  pair4  :  7 x (roll(2)  + 4 gathers + 3 selects + add)  (real pair)
  pair1  :  7 x (roll(2)  + 1 gather + add)   (hypothetical 25-wide
           single-gather hardware that does not exist -- lower bound)

Run on the real chip:  python experiments/pairsum_probe.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

M = 15
K = 5


def parity_host():
    """Count bit mismatches of pairwise vs sequential association over
    every window of the bench genome (the workload bench.py gates on)."""
    from bench import ECOLI_LENGTH, PATTERNS
    from lightmotif_tpu import CountMatrix, EncodedSequence

    cm = CountMatrix.from_sequences(
        EncodedSequence.encode(p) for p in PATTERNS)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    pmat = np.asarray(pssm.data, np.float32)
    rng = np.random.default_rng(0xECC011)
    s = rng.integers(0, 4, size=ECOLI_LENGTH, dtype=np.int8)
    n = ECOLI_LENGTH - M + 1

    # sequential (the mandated order; == score_host)
    seq_acc = pmat[0][s[:n]].astype(np.float32)
    for j in range(1, M):
        seq_acc = seq_acc + pmat[j][s[j:j + n]]

    # pairwise: p_j = f32(t_2j + t_2j+1) from an exact pair table,
    # then left-fold the pair values (+ trailing odd row)
    pair_acc = None
    for j in range(0, M - 1, 2):
        t = (pmat[j][s[j:j + n]].astype(np.float32)
             + pmat[j + 1][s[j + 1:j + 1 + n]])  # exact table entry
        pair_acc = t if pair_acc is None else pair_acc + t
    if M % 2:
        pair_acc = pair_acc + pmat[M - 1][s[M - 1:M - 1 + n]]
    mism = int(np.count_nonzero(seq_acc.view(np.int32)
                                != pair_acc.view(np.int32)))
    print(f"pairwise vs sequential: {mism} / {n} windows differ "
          f"({100.0 * mism / n:.2f}%)", flush=True)

    # prefix-chunk variant: ONE precomputed exact sequential prefix of
    # the first r rows, then sequential adds -- must be mismatch-free
    for r in (2, 4, 6):
        pre = pmat[0][s[:n]].astype(np.float32)
        for j in range(1, r):
            pre = pre + pmat[j][s[j:j + n]]  # the table would hold this
        acc = pre
        for j in range(r, M):
            acc = acc + pmat[j][s[j:j + n]]
        pm = int(np.count_nonzero(seq_acc.view(np.int32)
                                  != acc.view(np.int32)))
        print(f"prefix-{r} chunk + sequential tail: {pm} mismatches",
              flush=True)
    return mism


def cost_device():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tools.perf import repeat_time

    CHUNKS, BL = 8, 65536
    GRID = 9
    LP = CHUNKS * BL * GRID

    def make_kernel(mode):
        def kern(b0_ref, out_ref):
            x = b0_ref[:].astype(jnp.int32)
            sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNKS, 1), 0)
            col = jnp.broadcast_to(sub.astype(jnp.float32), (CHUNKS, BL))
            if mode == "single":
                idx = x % K
                acc = jnp.zeros((CHUNKS, BL), jnp.float32)
                for _ in range(M - 1):
                    idx = pltpu.roll(idx, BL - 1, axis=1)
                    v = jnp.take_along_axis(col, idx & 7, axis=0)
                    acc = acc + v
                out_ref[:] = acc
            elif mode == "pair1":
                # hypothetical one-gather pair lookup (25-entry sublane
                # table does not exist on this hardware)
                idx = (x % K) * K + ((x >> 2) % K)  # stand-in pair code
                acc = jnp.zeros((CHUNKS, BL), jnp.float32)
                for _ in range((M - 1) // 2):
                    idx = pltpu.roll(idx, BL - 2, axis=1)
                    v = jnp.take_along_axis(col, idx & 7, axis=0)
                    acc = acc + v
                out_ref[:] = acc
            elif mode == "pair4":
                # the real construction: 25-entry table = 4 sublane
                # groups + range selects (kernels.py protein path)
                idx = (x % K) * K + ((x >> 2) % K)
                acc = jnp.zeros((CHUNKS, BL), jnp.float32)
                for _ in range((M - 1) // 2):
                    idx = pltpu.roll(idx, BL - 2, axis=1)
                    low = idx & 7
                    v = jnp.take_along_axis(col, low, axis=0)
                    for g in range(1, 4):
                        vg = jnp.take_along_axis(col + float(g), low,
                                                 axis=0)
                        v = jnp.where(idx >= 8 * g, vg, v)
                    acc = acc + v
                out_ref[:] = acc
        return kern

    seq = jax.device_put(np.random.default_rng(0).integers(
        0, 127, size=LP, dtype=np.int8))
    for mode in ("single", "pair1", "pair4"):
        kern = make_kernel(mode)

        @jax.jit
        def run(s, carry):
            view = (s + carry.astype(jnp.int8)).reshape(
                CHUNKS, BL * GRID)
            return pl.pallas_call(
                kern,
                grid=(GRID,),
                in_specs=[pl.BlockSpec((CHUNKS, BL), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((CHUNKS, BL), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((CHUNKS, BL * GRID),
                                               jnp.float32),
            )(view)

        per, spans = repeat_time(
            lambda: (run, (seq,), 12345), r_lo=64, r_hi=2048, trials=3)
        rate = LP / per
        cyc = 940e6 / (rate / 1024)
        print(f"{mode:7s} {rate/1e9:7.2f} Gpos/s  {cyc:6.2f} cyc/vreg  "
              f"span={1000 * (spans[2048] - spans[64]):.0f} ms",
              flush=True)


if __name__ == "__main__":
    parity_host()
    cost_device()
