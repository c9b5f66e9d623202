"""Probe 3: is the ~30 Gpos/s wall compute or IO/pipeline?

Every op-count variant of the gather kernel lands within 2% of ~30
Gpos/s, which smells like a non-compute bound.  Cases (all r32->r1024,
spans >= 150 ms):

* io_only      same geometry/blockspecs, kernel body = cast+write only
               -> the pipeline/IO floor of the current structure
* io_narrow    io_only but the halo input block is [8, 128] instead of
               a full duplicate [8, bb] block (halves input traffic)
* g8_narrow    production gather kernel with the narrow halo block
* g8_narrow_guard  + tail-guarded validity mask
* u8_i8out     discrete path writing int8 instead of int32 (4x less
               output traffic) -- parity vs int32 path checked
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
from lightmotif_tpu.ops import kernels

OUT = "/root/repo/experiments/f32_probe3.out"
BB = 65536
HALO_BLK = 128  # lanes fetched for the halo (>= m - 1)


def log(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
    print(obj, flush=True)


def _io_kernel(tab_ref, b0_ref, b1_ref, out_ref, **_):
    out_ref[:] = b0_ref[:].astype(jnp.float32) + tab_ref[0, 0]


def _g8n_kernel(tab_ref, b0_ref, b1_ref, out_ref, *, m, k, rows, grid,
                n_scores, bb, guard):
    i = pl.program_id(0)
    w = m - 1
    b0 = b0_ref[:].astype(jnp.int32)
    halo_src = b1_ref[:, :w].astype(jnp.int32)  # [8, w] of the 128 blk
    wrapped = pltpu.roll(halo_src, 8 - 1, axis=0)
    halo = jnp.where(i == grid - 1, wrapped, halo_src)
    window = jnp.concatenate([b0, halo], axis=1)
    width = bb + w
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def lookup(j):
        col = jnp.full((8, 1), tab_ref[j, k - 1])
        for s in range(k - 2, -1, -1):
            col = jnp.where(sub == s, tab_ref[j, s], col)
        table = jnp.broadcast_to(col, (8, width))
        return jnp.take_along_axis(table, window, axis=0)

    acc = lookup(0)
    for j in range(1, m):
        acc = acc + pltpu.roll(lookup(j), width - j, axis=1)
    acc = acc[:, :bb]

    if guard is None:
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (8, bb), 0)
        l_ids = jax.lax.broadcasted_iota(jnp.int32, (8, bb), 1)
        pos = c_ids * rows + i * bb + l_ids
        out_ref[:] = jnp.where(pos < n_scores, acc, -jnp.inf)
    else:
        @pl.when(i < guard)
        def _():
            out_ref[:] = acc

        @pl.when(i >= guard)
        def _():
            c_ids = jax.lax.broadcasted_iota(jnp.int32, (8, bb), 0)
            l_ids = jax.lax.broadcasted_iota(jnp.int32, (8, bb), 1)
            pos = c_ids * rows + i * bb + l_ids
            out_ref[:] = jnp.where(pos < n_scores, acc, -jnp.inf)


def _specs(rows, grid, narrow):
    b0 = pl.BlockSpec((8, BB), lambda i: (0, i), memory_space=pltpu.VMEM)
    if narrow:
        nblk = BB // HALO_BLK
        b1 = pl.BlockSpec(
            (8, HALO_BLK), lambda i: (0, ((i + 1) % grid) * nblk),
            memory_space=pltpu.VMEM)
    else:
        b1 = pl.BlockSpec((8, BB), lambda i: (0, (i + 1) % grid),
                          memory_space=pltpu.VMEM)
    return [pl.BlockSpec(memory_space=pltpu.SMEM), b0, b1]


@functools.partial(jax.jit, static_argnames=("n_scores", "mode"))
def run_case(seq, table, n_scores, mode):
    lp = seq.shape[0]
    rows = lp // 8
    grid = rows // BB
    m, k = table.shape
    view = seq.reshape(8, rows)
    if mode in ("io_only", "io_narrow"):
        kernel = functools.partial(_io_kernel)
        narrow = mode == "io_narrow"
    else:
        guard = max(0, min(grid - 1, (n_scores - 7 * rows) // BB)) \
            if mode == "g8_narrow_guard" else None
        kernel = functools.partial(
            _g8n_kernel, m=m, k=k, rows=rows, grid=grid,
            n_scores=n_scores, bb=BB, guard=guard)
        narrow = True
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=_specs(rows, grid, narrow),
        out_specs=pl.BlockSpec((8, BB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, rows), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(table, view, view).reshape(-1)


def _u8o_kernel(tab_ref, b0_ref, b1_ref, out_ref, *, m, k, rows, grid,
                n_scores, bb):
    """Discrete path writing int8 (4x less output traffic)."""
    i = pl.program_id(0)
    w = m - 1
    b0 = b0_ref[:].astype(jnp.int32)
    halo_src = b1_ref[:, :w].astype(jnp.int32)
    wrapped = pltpu.roll(halo_src, 8 - 1, axis=0)
    halo = jnp.where(i == grid - 1, wrapped, halo_src)
    window = jnp.concatenate([b0, halo], axis=1)
    width = bb + w
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def lookup(j):
        col = jnp.full((8, 1), tab_ref[j, k - 1])
        for s in range(k - 2, -1, -1):
            col = jnp.where(sub == s, tab_ref[j, s], col)
        table = jnp.broadcast_to(col, (8, width))
        return jnp.take_along_axis(table, window, axis=0)

    acc = lookup(0)
    for j in range(1, m):
        acc = acc + pltpu.roll(lookup(j), width - j, axis=1)
    acc = jnp.minimum(acc[:, :bb], 255.0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (8, bb), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (8, bb), 1)
    pos = c_ids * rows + i * bb + l_ids
    out_ref[:] = jnp.where(pos < n_scores, acc, 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("n_scores",))
def u8o_score(seq, table, n_scores):
    lp = seq.shape[0]
    rows = lp // 8
    grid = rows // BB
    m, k = table.shape
    view = seq.reshape(8, rows)
    kernel = functools.partial(_u8o_kernel, m=m, k=k, rows=rows,
                               grid=grid, n_scores=n_scores, bb=BB)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=_specs(rows, grid, True),
        out_specs=pl.BlockSpec((8, BB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, rows), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(table, view, view).reshape(-1)


def main():
    from lightmotif_tpu import CountMatrix, EncodedSequence

    log({"event": "start", "t": time.time()})
    patterns = ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"]
    cm = CountMatrix.from_sequences(EncodedSequence.encode(p)
                                    for p in patterns)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    m = len(pssm)
    table = jnp.asarray(np.asarray(pssm.data, dtype=np.float32))
    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    L = len(seq)
    n_scores = L - m + 1
    oracle = pssm.score_host(seq)

    unit = 8 * BB
    lp = -(-L // unit) * unit
    flat = np.full(lp, 4, dtype=np.int8)
    flat[:L] = genome
    sdev = jax.device_put(flat)

    for mode in ("io_only", "io_narrow", "g8_narrow", "g8_narrow_guard"):
        try:
            fn = lambda s, p, carry: run_case(s, p + carry, n_scores, mode)
            out = jax.device_get(fn(sdev, table, jnp.float32(0.0)))
            if mode.startswith("g8"):
                ok = bool(np.array_equal(out[:n_scores], oracle))
                log({"case": mode, "full_genome_parity": ok})
                if not ok:
                    continue
            per, raw = repeat_time(
                lambda: (fn, (sdev, table), n_scores - 1),
                r_lo=32, r_hi=1024, trials=3)
            log({"case": mode,
                 "span_ms": round((raw[1024] - raw[32]) * 1e3, 1),
                 "gpos_per_s": round(n_scores / per / 1e9, 2),
                 "vs_avx2": round(n_scores / per / 1.029e9, 1)})
        except Exception as e:
            log({"case": mode, "error": repr(e)[:300]})

    # u8 path with int8 output (4x less write traffic)
    try:
        dm = pssm.to_discrete()
        dmtab = jnp.asarray(dm.data.astype(np.float32))
        fn = lambda s, p, carry: u8o_score(s, p + carry, n_scores)
        out = jax.device_get(fn(sdev, dmtab, jnp.float32(0.0)))
        m2 = len(pssm)
        win = np.lib.stride_tricks.sliding_window_view(
            flat[:200_000 + m2 - 1].astype(np.int64), m2)
        dv = dm.data.astype(np.int64)
        want = np.minimum(dv[np.arange(m2)[None, :], win].sum(1), 255)
        ok = bool(np.array_equal(out[:200_000].astype(np.int64), want))
        log({"case": "u8_i8out", "parity_200k": ok})
        per, raw = repeat_time(
            lambda: (fn, (sdev, dmtab), n_scores - 1),
            r_lo=32, r_hi=1024, trials=3)
        log({"case": "u8_i8out",
             "span_ms": round((raw[1024] - raw[32]) * 1e3, 1),
             "gpos_per_s": round(n_scores / per / 1e9, 2)})
    except Exception as e:
        log({"case": "u8_i8out", "error": repr(e)[:300]})

    log({"event": "done"})


if __name__ == "__main__":
    main()
