"""Sweep 7: sublane-gather lookups (take_along_axis) -- the TPU
permutevar8x32 analogue.

  tga_f32   -- lookup(j) = take_along_axis(tab_bcast_j, window, axis=0)
               with the K=5 table in sublanes 0..4 of each 8-sublane
               group.  One gather replaces the 4-select chain.
  probes    -- i8/i16 2D gathers and elementwise i8 (block-sized now).
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

OUT = "/root/repo/experiments/perf_variants7.out"
CC, BB = 256, 2048


def log(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
    print(obj, flush=True)


def _tga_kernel(tab_ref, b0_ref, b1_ref, out_ref, *, m, k, rows, grid,
                n_scores, block_lanes, chunks):
    i = pl.program_id(0)
    w = m - 1
    b0 = b0_ref[:].astype(jnp.int32)
    halo_src = b1_ref[:, :w].astype(jnp.int32)
    wrapped = pltpu.roll(halo_src, chunks - 1, axis=0)
    halo = jnp.where(i == grid - 1, wrapped, halo_src)
    window = jnp.concatenate([b0, halo], axis=1)  # [C, W] int32
    width = block_lanes + w

    # window index within each 8-sublane group (values 0..4 < 8)
    def lookup(j):
        # table for row j, in sublanes (broadcast along lanes):
        # tab_ref is [m, 8] SMEM; build [8, width] then tile to [C, width]
        col = jnp.zeros((8, 1), jnp.float32)
        vals = [tab_ref[j, s] for s in range(k)]
        col = jnp.concatenate(
            [jnp.full((1, 1), v) for v in vals]
            + [jnp.zeros((8 - k, 1), jnp.float32)], axis=0)
        src = jnp.broadcast_to(col, (8, width))
        srcC = jnp.concatenate([src] * (chunks // 8), axis=0)  # [C, width]
        return jnp.take_along_axis(srcC, window, axis=0)

    acc = lookup(0)
    for j in range(1, m):
        acc = acc + pltpu.roll(lookup(j), width - j, axis=1)
    acc = acc[:, :block_lanes]

    c_ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, block_lanes), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, block_lanes), 1)
    pos = c_ids * rows + i * block_lanes + l_ids
    out_ref[:] = jnp.where(pos < n_scores, acc, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("n_scores",))
def tga_score(seq, tab, n_scores):
    m = tab.shape[0]
    k = 5
    lp = seq.shape[0]
    rows = lp // CC
    grid = rows // BB
    view = seq.reshape(CC, rows)
    kernel = functools.partial(
        _tga_kernel, m=m, k=k, rows=rows, grid=grid, n_scores=n_scores,
        block_lanes=BB, chunks=CC)
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
    )(tab, view, view)
    return out.reshape(-1)


# -- probes ------------------------------------------------------------------


def _probe_kernel(b0_ref, out_ref, *, op):
    x = b0_ref[:]
    if op == "i8_select":
        out_ref[:] = jnp.where(x == 0, jnp.int8(7), x)
    elif op == "i8_add_sat":
        s = (x + x).astype(jnp.int8)
        out_ref[:] = jnp.where(s < x, jnp.int8(127), s)
    elif op == "i8_roll":
        out_ref[:] = pltpu.roll(x, 5, axis=1)
    elif op == "tga_i8_32":
        # 32-entry i8 table per 32-sublane group?
        tab = jnp.broadcast_to(
            jnp.arange(32, dtype=jnp.int8).reshape(32, 1) * 3,
            (32, x.shape[1]))
        tabC = jnp.concatenate([tab] * (x.shape[0] // 32), axis=0)
        idx = (x.astype(jnp.int32) % 32)
        out_ref[:] = jnp.take_along_axis(
            tabC, idx, axis=0).astype(jnp.int8)
    elif op == "tga_i32_16":
        # does a 32-bit sublane gather allow 16-deep tables?
        tab = jnp.broadcast_to(
            (jnp.arange(16, dtype=jnp.int32) * 3).reshape(16, 1),
            (16, x.shape[1]))
        tabC = jnp.concatenate([tab] * (x.shape[0] // 16), axis=0)
        idx = x.astype(jnp.int32) % 16
        out_ref[:] = jnp.take_along_axis(tabC, idx, axis=0).astype(jnp.int8)


def probe(op, flat):
    view = flat.reshape(CC, -1)[:, :512]

    @jax.jit
    def run(v):
        return pl.pallas_call(
            functools.partial(_probe_kernel, op=op),
            out_shape=jax.ShapeDtypeStruct(v.shape, jnp.int8),
        )(v)

    out = jax.device_get(run(view))
    return out


def main():
    from lightmotif_tpu import CountMatrix, EncodedSequence

    dev = jax.devices()[0]
    log({"event": "start", "kind": getattr(dev, "device_kind", "?")})

    patterns = ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"]
    cm = CountMatrix.from_sequences(EncodedSequence.encode(p) for p in patterns)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    m = len(pssm)
    tabnp = np.zeros((m, 8), np.float32)
    tabnp[:, :5] = np.asarray(pssm.data, dtype=np.float32)

    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    L = len(seq)
    n_scores = L - m + 1
    oracle = pssm.score_host(seq)[:200_000]

    unit = CC * BB
    lp = max(unit, -(-L // unit) * unit)
    flat = np.full(lp, 4, dtype=np.int8)
    flat[:L] = genome
    sdev = jax.device_put(flat)
    tdev = jax.device_put(tabnp)

    try:
        fn = lambda s, t, carry: tga_score(s, t + carry, n_scores)
        t0 = time.time()
        out = jax.device_get(fn(sdev, tdev, jnp.float32(0.0)))
        compile_s = time.time() - t0
        scores = out[:200_000]
        exact = bool(np.array_equal(scores, oracle))
        if not exact:
            bad = int(np.argmin(scores == oracle))
            log({"case": "tga_f32", "parity": False, "first_bad": bad,
                 "got": float(scores[bad]), "want": float(oracle[bad])})
        else:
            per_iter, raw = repeat_time(
                lambda: (fn, (sdev, tdev), n_scores - 1),
                r_lo=8, r_hi=128, trials=4)
            log({"case": "tga_f32", "parity": True,
                 "compile_s": round(compile_s, 1),
                 "us_per_scan": round(per_iter * 1e6, 1),
                 "gpos_per_s": round(n_scores / per_iter / 1e9, 2),
                 "vs_avx2": round(n_scores / per_iter / 1.029e9, 1)})
    except Exception as e:
        log({"case": "tga_f32", "error": repr(e)[:400]})

    for op in ["i8_select", "i8_add_sat", "i8_roll", "tga_i8_32", "tga_i32_16"]:
        try:
            out = probe(op, flat[:CC * 512])
            ok = True
            if op == "tga_i32_16":
                idx = (flat[:CC * 512].reshape(CC, -1)[:, :512] % 16)
                ok = bool(np.array_equal(out, (idx * 3).astype(np.int8)))
            if op == "tga_i8_32":
                idx = (flat[:CC * 512].reshape(CC, -1)[:, :512] % 32)
                ok = bool(np.array_equal(out, (idx * 3).astype(np.int8)))
            log({"probe": op, "ok": ok})
        except Exception as e:
            log({"probe": op, "ok": False, "error": repr(e)[:300]})

    log({"event": "done"})


if __name__ == "__main__":
    main()
