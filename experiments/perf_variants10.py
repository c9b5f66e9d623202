"""Sweep 10: select-tree depth reduction + last-block-only masking."""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.perf import repeat_time

OUT = "/root/repo/experiments/perf_variants10.out"
CC, BB = 256, 2048


def log(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
    print(obj, flush=True)


def _kernel(tab_ref, b0_ref, b1_ref, out_ref, *, m, k, rows, grid,
            n_scores, block_lanes, chunks, tree, lazymask):
    i = pl.program_id(0)
    w = m - 1
    b0 = b0_ref[:].astype(jnp.int32)
    halo_src = b1_ref[:, :w].astype(jnp.int32)
    wrapped = pltpu.roll(halo_src, chunks - 1, axis=0)
    halo = jnp.where(i == grid - 1, wrapped, halo_src)
    window = jnp.concatenate([b0, halo], axis=1)
    width = block_lanes + w

    if tree:
        # depth-2 balanced tree: chain latency 2 instead of 4
        lo = window < 2
        m0 = window == 0
        m2 = window == 2
        m3 = window == 3

        def lookup(j):
            a = jnp.where(m0, tab_ref[j, 0], tab_ref[j, 1])
            b = jnp.where(m2, tab_ref[j, 2],
                          jnp.where(m3, tab_ref[j, 3], tab_ref[j, 4]))
            return jnp.where(lo, a, b)
    else:
        masks = [window == s for s in range(k - 1)]

        def lookup(j):
            val = jnp.full((chunks, width), tab_ref[j, k - 1])
            for s in range(k - 2, -1, -1):
                val = jnp.where(masks[s], tab_ref[j, s], val)
            return val

    acc = lookup(0)
    for j in range(1, m):
        acc = acc + pltpu.roll(lookup(j), width - j, axis=1)
    acc = acc[:, :block_lanes]

    if lazymask:
        @pl.when(i < grid - 1)
        def _():
            out_ref[:] = acc

        @pl.when(i == grid - 1)
        def _():
            c_ids = jax.lax.broadcasted_iota(
                jnp.int32, (chunks, block_lanes), 0)
            l_ids = jax.lax.broadcasted_iota(
                jnp.int32, (chunks, block_lanes), 1)
            pos = c_ids * rows + i * block_lanes + l_ids
            out_ref[:] = jnp.where(pos < n_scores, acc, -jnp.inf)
    else:
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, block_lanes), 0)
        l_ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, block_lanes), 1)
        pos = c_ids * rows + i * block_lanes + l_ids
        out_ref[:] = jnp.where(pos < n_scores, acc, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("n_scores", "tree", "lazymask"))
def v10_score(seq, table, n_scores, tree, lazymask):
    m, k = table.shape
    lp = seq.shape[0]
    rows = lp // CC
    grid = rows // BB
    view = seq.reshape(CC, rows)
    kernel = functools.partial(
        _kernel, m=m, k=k, rows=rows, grid=grid, n_scores=n_scores,
        block_lanes=BB, chunks=CC, tree=tree, lazymask=lazymask)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((CC, BB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((CC, BB), lambda i: (0, (i + 1) % grid),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CC, BB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CC, rows), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(table, view, view)
    return out.reshape(-1)


def main():
    from lightmotif_tpu import CountMatrix, EncodedSequence

    log({"event": "start"})
    patterns = ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"]
    cm = CountMatrix.from_sequences(EncodedSequence.encode(p) for p in patterns)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    m = len(pssm)
    table = jnp.asarray(np.asarray(pssm.data, dtype=np.float32))
    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    L = len(seq)
    n_scores = L - m + 1
    oracle = pssm.score_host(seq)[:200_000]

    unit = CC * BB
    lp = -(-L // unit) * unit
    flat = np.full(lp, 4, dtype=np.int8)
    flat[:L] = genome
    sdev = jax.device_put(flat)

    for rep in range(2):
        for tree in (False, True):
            for lazy in (False, True):
                name = f"tree{int(tree)}_lazy{int(lazy)}"
                try:
                    fn = lambda s, p, carry: v10_score(
                        s, p + carry, n_scores, tree, lazy)
                    out = jax.device_get(fn(sdev, table, jnp.float32(0.0)))
                    if rep == 0 and not np.array_equal(out[:200_000], oracle):
                        bad = int(np.argmin(out[:200_000] == oracle))
                        log({"case": name, "parity": False, "bad": bad})
                        continue
                    per, _ = repeat_time(
                        lambda: (fn, (sdev, table), n_scores - 1),
                        r_lo=8, r_hi=128, trials=4)
                    log({"case": name, "rep": rep,
                         "gpos_per_s": round(n_scores / per / 1e9, 2),
                         "vs_avx2": round(n_scores / per / 1.029e9, 1)})
                except Exception as e:
                    log({"case": name, "error": repr(e)[:300]})

    log({"event": "done"})


if __name__ == "__main__":
    main()
