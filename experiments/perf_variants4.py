"""Sweep 4: heads side-input (128-lane-padded blocks) + stable timing.

Fast kernels (~30 us/scan) need more in-jit repetitions for a stable
slope; use r_lo=4, r_hi=64, trials=5.
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

OUT = "/root/repo/experiments/perf_variants4.out"
HEAD_W = 128  # lane width of one heads block (>= m-1, vreg-aligned)


def log(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
    print(obj, flush=True)


def _heads_kernel(tab_ref, b0_ref, hd_ref, out_ref, *, m, k, rows, grid,
                  n_scores, block_lanes, chunks):
    w = m - 1
    i = pl.program_id(0)
    b0 = b0_ref[:].astype(jnp.int32)
    window = jnp.concatenate(
        [b0, hd_ref[:, :w].astype(jnp.int32)], axis=1)
    width = block_lanes + w

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


def make_heads(view, w, grid, block_lanes):
    """[chunks, grid*HEAD_W]; block i lanes [:w] = lanes following block
    i (next-chunk wrap on the last block)."""
    chunks, rows = view.shape
    parts = []
    pad = jnp.zeros((chunks, HEAD_W - w), view.dtype)
    for i in range(grid - 1):
        parts.append(
            view[:, (i + 1) * block_lanes:(i + 1) * block_lanes + w])
        parts.append(pad)
    parts.append(jnp.roll(view[:, :w], -1, axis=0))
    parts.append(pad)
    return jnp.concatenate(parts, axis=1)


@functools.partial(jax.jit, static_argnames=("n_scores", "chunks", "block_lanes"))
def heads_score(seq, heads, table, n_scores, chunks, block_lanes):
    m, k = table.shape
    lp = seq.shape[0]
    rows = lp // chunks
    grid = rows // block_lanes
    view = seq.reshape(chunks, rows)
    kernel = functools.partial(
        _heads_kernel, m=m, k=k, rows=rows, grid=grid, n_scores=n_scores,
        block_lanes=block_lanes, chunks=chunks)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((chunks, block_lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunks, HEAD_W), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunks, block_lanes), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((chunks, rows), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(table, view, heads)
    return out.reshape(-1)


def main():
    from lightmotif_tpu import CountMatrix, EncodedSequence
    from experiments.perf_variants3 import base_score

    dev = jax.devices()[0]
    log({"event": "start", "kind": getattr(dev, "device_kind", "?")})

    patterns = ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"]
    cm = CountMatrix.from_sequences(EncodedSequence.encode(p) for p in patterns)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    m = len(pssm)
    w = m - 1
    table = jnp.asarray(np.asarray(pssm.data, dtype=np.float32))

    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    L = len(seq)
    n_scores = L - m + 1
    oracle = pssm.score_host(seq)[:200_000]

    cases = [
        ("base", 256, 2048),   # re-measure champion with high reps
        ("base", 256, 4096),
        ("heads", 256, 2048),
        ("heads", 256, 4096),
        ("heads", 256, 8192),
        ("heads", 512, 4096),
    ]

    for mode, Cc, B in cases:
        unit = Cc * B
        lp = max(unit, -(-L // unit) * unit)
        flat = np.full(lp, 4, dtype=np.int8)
        flat[:L] = genome
        sdev = jax.device_put(flat)
        rows = lp // Cc
        grid = rows // B
        name = f"{mode}_{Cc}x{B}"
        try:
            if mode == "heads":
                view = jnp.asarray(flat).reshape(Cc, rows)
                heads = jax.device_put(
                    jax.device_get(make_heads(view, w, grid, B)))
                fn = lambda s, h, p, carry: heads_score(
                    s, h, p + carry, n_scores, Cc, B)
                args = (sdev, heads, table)
            else:
                fn = lambda s, p, carry: base_score(
                    s, p + carry, n_scores, Cc, B)
                args = (sdev, table)
            t0 = time.time()
            out = jax.device_get(fn(*args, jnp.float32(0.0)))
            compile_s = time.time() - t0
            scores = out[:200_000]
            exact = bool(np.array_equal(scores, oracle))
            if not exact:
                bad = int(np.argmin(scores == oracle))
                log({"case": name, "parity": False, "first_bad": bad,
                     "got": float(scores[bad]), "want": float(oracle[bad])})
                continue
            per_iter, raw = repeat_time(
                lambda: (fn, args, n_scores - 1),
                r_lo=4, r_hi=64, trials=5)
            log({"case": name, "parity": exact,
                 "compile_s": round(compile_s, 1),
                 "raw": {str(kk): round(vv, 5) for kk, vv in raw.items()},
                 "gpos_per_s": round(n_scores / per_iter / 1e9, 2),
                 "vs_avx2": round(n_scores / per_iter / 1.029e9, 1)})
        except Exception as e:
            log({"case": name, "error": repr(e)[:500]})

    log({"event": "done"})


if __name__ == "__main__":
    main()
