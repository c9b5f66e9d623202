"""Sweep 2: diagnostics + ILP variants.

  diag_noroll -- acc += lookup(j), no rolls (WRONG output; times select+add)
  diag_nosel  -- acc += roll(window_f32, j) (WRONG; times roll+add)
  diag_addonly-- acc += window_f32 (WRONG; times adds alone)
  dual        -- two independent half-width accumulator chains, interleaved
  quad        -- four chains
  geom_CxB    -- base kernel at other (chunks, block_lanes) geometries
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

from lightmotif_tpu.ops import kernels
from tools.perf import repeat_time

OUT = "/root/repo/experiments/perf_variants2.out"


def log(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
    print(obj, flush=True)


def _kernel(tab_ref, b0_ref, b1_ref, out_ref, *, m, k, rows, grid,
            n_scores, block_lanes, chunks, mode):
    i = pl.program_id(0)
    w = m - 1
    b0 = b0_ref[:].astype(jnp.int32)
    halo_src = b1_ref[:, :w].astype(jnp.int32)
    wrapped = pltpu.roll(halo_src, chunks - 1, axis=0)
    halo = jnp.where(i == grid - 1, wrapped, halo_src)
    window = jnp.concatenate([b0, halo], axis=1)
    width = block_lanes + w

    if mode == "diag_addonly":
        wf = window.astype(jnp.float32)
        acc = wf
        for j in range(1, m):
            acc = acc + wf
        acc = acc[:, :block_lanes]
    elif mode == "diag_nosel":
        wf = window.astype(jnp.float32)
        acc = wf
        for j in range(1, m):
            acc = acc + pltpu.roll(wf, width - j, axis=1)
        acc = acc[:, :block_lanes]
    elif mode == "diag_noroll":
        masks = [window == s for s in range(k - 1)]

        def lookup(j):
            val = jnp.full((chunks, width), tab_ref[j, k - 1])
            for s in range(k - 2, -1, -1):
                val = jnp.where(masks[s], tab_ref[j, s], val)
            return val

        acc = lookup(0)
        for j in range(1, m):
            acc = acc + lookup(j)
        acc = acc[:, :block_lanes]
    elif mode.startswith("split"):
        n_chains = int(mode[5:])
        masks = [window == s for s in range(k - 1)]

        def lookup(j, lo, hi):
            val = jnp.full((chunks, hi - lo), tab_ref[j, k - 1])
            for s in range(k - 2, -1, -1):
                val = jnp.where(masks[s][:, lo:hi], tab_ref[j, s], val)
            return val

        # independent chains over lane sub-ranges; each chain's window
        # sub-range is [lo, hi + w) so rolls stay local to the chain.
        sub = block_lanes // n_chains
        accs = []
        luts = {}
        # interleave chain work at each j step
        for j in range(m):
            for c in range(n_chains):
                lo = c * sub
                luts[c] = lookup(j, lo, lo + sub + w)
            for c in range(n_chains):
                if j == 0:
                    accs.append(luts[c])
                else:
                    accs[c] = accs[c] + pltpu.roll(
                        luts[c], sub + w - j, axis=1)
        acc = jnp.concatenate([a[:, :sub] for a in accs], axis=1)
    else:  # base
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

    c_ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, block_lanes), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, block_lanes), 1)
    pos = c_ids * rows + i * block_lanes + l_ids
    out_ref[:] = jnp.where(pos < n_scores, acc, -jnp.inf)


@functools.partial(jax.jit, static_argnames=(
    "n_scores", "chunks", "block_lanes", "mode"))
def variant_score(seq, table, n_scores, chunks, block_lanes, mode):
    m, k = table.shape
    lp = seq.shape[0]
    rows = lp // chunks
    grid = rows // block_lanes
    view = seq.reshape(chunks, rows)
    kernel = functools.partial(
        _kernel, m=m, k=k, rows=rows, grid=grid, n_scores=n_scores,
        block_lanes=block_lanes, chunks=chunks, mode=mode)
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
    )(table, view, view)
    return out.reshape(-1)


def main():
    from lightmotif_tpu import CountMatrix, EncodedSequence
    from lightmotif_tpu.ops.pipeline import DeviceSequence

    dev = jax.devices()[0]
    log({"event": "start", "platform": dev.platform,
         "kind": getattr(dev, "device_kind", "?")})

    patterns = ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"]
    cm = CountMatrix.from_sequences(EncodedSequence.encode(p) for p in patterns)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()

    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    dseq = DeviceSequence(seq, pad_multiple=kernels.PAD_LANES)
    m = len(pssm)
    n_scores = dseq.length - m + 1
    table = jnp.asarray(np.asarray(pssm.data, dtype=np.float32))
    oracle = pssm.score_host(seq)[:200_000]

    cases = [
        ("diag_addonly", 512, 1024),
        ("diag_nosel", 512, 1024),
        ("diag_noroll", 512, 1024),
        ("split2", 512, 1024),
        ("split4", 512, 1024),
        ("base", 256, 2048),
        ("base", 1024, 512),
        ("base", 512, 2048),
        ("split2", 512, 2048),
    ]

    for mode, C, B in cases:
        name = f"{mode}_{C}x{B}"
        try:
            fn = lambda s, p, carry: variant_score(
                s, p + carry, n_scores, C, B, mode)
            t0 = time.time()
            out = jax.device_get(fn(dseq.data, table, jnp.float32(0.0)))
            compile_s = time.time() - t0
            exact = bool(np.array_equal(out[:200_000], oracle))
            if mode.startswith("diag"):
                exact = None  # diagnostics are intentionally wrong
            elif not exact:
                bad = int(np.argmin(out[:200_000] == oracle))
                log({"case": name, "parity": False, "first_bad": bad,
                     "got": float(out[bad]), "want": float(oracle[bad])})
                continue
            per_iter, _ = repeat_time(
                lambda: (fn, (dseq.data, table), n_scores - 1),
                r_lo=2, r_hi=12, trials=4)
            log({"case": name, "parity": exact,
                 "compile_s": round(compile_s, 1),
                 "gpos_per_s": round(n_scores / per_iter / 1e9, 2),
                 "vs_avx2": round(n_scores / per_iter / 1.029e9, 1)})
        except Exception as e:
            log({"case": name, "error": repr(e)[:500]})

    log({"event": "done"})


if __name__ == "__main__":
    main()
