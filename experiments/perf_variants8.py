"""Sweep 8: sublane-gather lookup kernels + reliable ILP re-measurement.

The take_along_axis sublane gather works ONLY on 8-row arrays (any lane
width) -- a vreg-local permute, the exact analogue of the reference's
permutevar8x32 row lookup (avx2.rs:101-199).  Variants:

  gat8_W{B}    -- chunks=8 geometry, window [8, B+w], one gather per j
  gatgrp_256   -- chunks=256, gathers on 32 x 8-row groups per j
  split2/4     -- independent accumulator chains (reliable re-measure)
  addsplit4    -- diagnostic: adds only, 4 interleaved chains
"""

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
from experiments.perf_variants2 import variant_score as v2_score

OUT = "/root/repo/experiments/perf_variants8.out"


def log(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
    print(obj, flush=True)


def _gather_kernel(tab_ref, b0_ref, b1_ref, out_ref, *, m, k, rows, grid,
                   n_scores, block_lanes, chunks):
    """Lookup via per-vreg sublane gather; table rows replicated into
    every 8-sublane group of the block."""
    i = pl.program_id(0)
    w = m - 1
    b0 = b0_ref[:].astype(jnp.int32)
    halo_src = b1_ref[:, :w].astype(jnp.int32)
    wrapped = pltpu.roll(halo_src, chunks - 1, axis=0)
    halo = jnp.where(i == grid - 1, wrapped, halo_src)
    window = jnp.concatenate([b0, halo], axis=1)  # [chunks, width] i32
    width = block_lanes + w

    def grp_gather(j, win):
        """take_along_axis on 8-row groups (gather only supports 8)."""
        # tab_ref[j] is an SMEM row [8]; build an [8, width] table tile
        tab_tile = jnp.concatenate(
            [jnp.full((1, win.shape[1]), tab_ref[j, s]) for s in range(8)],
            axis=0)
        if win.shape[0] == 8:
            return jnp.take_along_axis(tab_tile, win, axis=0)
        outs = []
        for g in range(win.shape[0] // 8):
            outs.append(jnp.take_along_axis(
                tab_tile, win[g * 8:(g + 1) * 8], axis=0))
        return jnp.concatenate(outs, axis=0)

    acc = grp_gather(0, window)
    for j in range(1, m):
        acc = acc + pltpu.roll(grp_gather(j, window), width - j, axis=1)
    acc = acc[:, :block_lanes]

    c_ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, block_lanes), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, block_lanes), 1)
    pos = c_ids * rows + i * block_lanes + l_ids
    out_ref[:] = jnp.where(pos < n_scores, acc, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("n_scores", "chunks", "block_lanes"))
def gather_score(seq, tab8, n_scores, chunks, block_lanes):
    m = tab8.shape[0]
    k = 5
    lp = seq.shape[0]
    rows = lp // chunks
    grid = rows // block_lanes
    view = seq.reshape(chunks, rows)
    kernel = functools.partial(
        _gather_kernel, m=m, k=k, rows=rows, grid=grid, n_scores=n_scores,
        block_lanes=block_lanes, chunks=chunks)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((chunks, block_lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunks, block_lanes), lambda i: (0, (i + 1) % grid),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunks, block_lanes), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((chunks, rows), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tab8, view, view)
    return out.reshape(-1)


def _addsplit_kernel(tab_ref, b0_ref, out_ref, *, m, n_chains):
    x = b0_ref[:].astype(jnp.float32)
    sub = x.shape[1] // n_chains
    accs = [x[:, c * sub:(c + 1) * sub] for c in range(n_chains)]
    for j in range(1, m):
        for c in range(n_chains):
            accs[c] = accs[c] + accs[c] * 0 + x[:, c * sub:(c + 1) * sub]
    out_ref[:] = jnp.concatenate(accs, axis=1)


def main():
    from lightmotif_tpu import CountMatrix, EncodedSequence

    dev = jax.devices()[0]
    log({"event": "start", "kind": getattr(dev, "device_kind", "?")})

    patterns = ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"]
    cm = CountMatrix.from_sequences(EncodedSequence.encode(p) for p in patterns)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    m = len(pssm)
    tab8 = np.zeros((m, 8), np.float32)
    tab8[:, :5] = np.asarray(pssm.data, dtype=np.float32)
    tab8[:, 5:] = 0.0

    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    L = len(seq)
    n_scores = L - m + 1
    oracle = pssm.score_host(seq)[:200_000]

    cases = []

    def add_gather(Cc, B):
        unit = Cc * B
        lp = max(unit, -(-L // unit) * unit)
        flat = np.full(lp, 4, dtype=np.int8)
        flat[:L] = genome
        sdev = jax.device_put(flat)
        tdev = jax.device_put(tab8)
        fn = lambda s, t, carry: gather_score(s, t + carry, n_scores, Cc, B)
        cases.append((f"gat_{Cc}x{B}", fn, (sdev, tdev), True))

    def add_v2(name, Cc, B, mode):
        unit = Cc * B
        lp = max(unit, -(-L // unit) * unit)
        flat = np.full(lp, 4, dtype=np.int8)
        flat[:L] = genome
        sdev = jax.device_put(flat)
        tdev = jnp.asarray(np.asarray(pssm.data, dtype=np.float32))
        fn = lambda s, t, carry: v2_score(s, t + carry, n_scores, Cc, B, mode)
        cases.append((name, fn, (sdev, tdev), not mode.startswith("diag")))

    add_gather(8, 65536)
    add_gather(64, 8192)
    add_gather(256, 2048)
    add_v2("split2_256x2048", 256, 2048, "split2")
    add_v2("split4_256x2048", 256, 2048, "split4")

    for rep in range(2):
        for name, fn, args, check in cases:
            try:
                t0 = time.time()
                out = jax.device_get(fn(*args, jnp.float32(0.0)))
                compile_s = time.time() - t0
                if check and rep == 0:
                    scores = out[:200_000]
                    if not np.array_equal(scores, oracle):
                        bad = int(np.argmin(scores == oracle))
                        log({"case": name, "parity": False, "first_bad": bad,
                             "got": float(scores[bad]),
                             "want": float(oracle[bad])})
                        continue
                per_iter, raw = repeat_time(
                    lambda: (fn, args, n_scores - 1),
                    r_lo=8, r_hi=128, trials=4)
                log({"case": name, "rep": rep,
                     "compile_s": round(compile_s, 1),
                     "us_per_scan": round(per_iter * 1e6, 1),
                     "gpos_per_s": round(n_scores / per_iter / 1e9, 2),
                     "vs_avx2": round(n_scores / per_iter / 1.029e9, 1)})
            except Exception as e:
                log({"case": name, "rep": rep, "error": repr(e)[:300]})

    log({"event": "done"})


if __name__ == "__main__":
    main()
