"""Round-2 sweep 11: speed-of-light closure probes for the exact-f32 kernel.

Goal (VERDICT task 1): turn the "~70 Gpos/s adds-only floor" into a
derived ceiling, and test the ONE unexplored lookup mechanism -- a
true 1-op table gather -- against the 4-select chain.

Probes:
* prod      production [256x2048] select-chain kernel (baseline)
* floor     adds+rolls only, lookup replaced by the raw block (the
            round-1 "structural floor" variant, re-measured)
* gather8   [8 x Lp/8] geometry: per-j lookup via ONE
            jnp.take_along_axis sublane gather against a lane-broadcast
            [8, width] table (vs 1 full + 4 selects).  If the hardware
            has a real cross-sublane gather this should approach the
            floor; if Mosaic lowers it to selects it will match prod.
* caldep    VPU calibration: N dependent f32 add/sub per element
            (latency-bound rate)
* calind    VPU calibration: 8 independent add/sub chains
            (throughput-bound rate -> effective T elem-ops/s)
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

OUT = "/root/repo/experiments/f32_probe.out"
CC, BB = 256, 2048
G8_BB = 32768


def log(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
    print(obj, flush=True)


# ---------------------------------------------------------------- floor


def _floor_kernel(tab_ref, b0_ref, b1_ref, out_ref, *, m, rows, grid,
                  n_scores):
    i = pl.program_id(0)
    w = m - 1
    b0 = b0_ref[:].astype(jnp.int32)
    halo_src = b1_ref[:, :w].astype(jnp.int32)
    wrapped = pltpu.roll(halo_src, CC - 1, axis=0)
    halo = jnp.where(i == grid - 1, wrapped, halo_src)
    window = jnp.concatenate([b0, halo], axis=1).astype(jnp.float32)
    width = BB + w
    acc = window * tab_ref[0, 0]
    for j in range(1, m):
        acc = acc + pltpu.roll(window * tab_ref[j, 0], width - j, axis=1)
    acc = acc[:, :BB]
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (CC, BB), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (CC, BB), 1)
    pos = c_ids * rows + i * BB + l_ids
    out_ref[:] = jnp.where(pos < n_scores, acc, -jnp.inf)


# --------------------------------------------------------------- gather8


def _g8_kernel(tab_ref, b0_ref, b1_ref, out_ref, *, m, k, rows, grid,
               n_scores, bb):
    i = pl.program_id(0)
    w = m - 1
    b0 = b0_ref[:].astype(jnp.int32)
    halo_src = b1_ref[:, :w].astype(jnp.int32)
    wrapped = pltpu.roll(halo_src, 8 - 1, axis=0)
    halo = jnp.where(i == grid - 1, wrapped, halo_src)
    window = jnp.concatenate([b0, halo], axis=1)  # [8, bb + w] i32
    width = bb + w
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def lookup(j):
        col = jnp.full((8, 1), tab_ref[j, k - 1])
        for s in range(k - 2, -1, -1):
            col = jnp.where(sub == s, tab_ref[j, s], col)  # [8,1]: ~free
        table = jnp.broadcast_to(col, (8, width))
        return jnp.take_along_axis(table, window, axis=0)

    acc = lookup(0)
    for j in range(1, m):
        acc = acc + pltpu.roll(lookup(j), width - j, axis=1)
    acc = acc[:, :bb]
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (8, bb), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (8, bb), 1)
    pos = c_ids * rows + i * bb + l_ids
    out_ref[:] = jnp.where(pos < n_scores, acc, -jnp.inf)


# ----------------------------------------------------------- calibration


def _cal_kernel(bias_ref, b0_ref, out_ref, *, n_ops, dep):
    # bias carries the timing-loop perturbation INTO the kernel input
    # (perturbing only the output lets XLA hoist the op out of the loop)
    b = b0_ref[:].astype(jnp.float32) + bias_ref[0, 0]
    if dep:
        acc = b
        for _ in range(n_ops // 2):
            acc = acc + b
            acc = acc - b
        out_ref[:] = acc
    else:
        accs = [b + float(i) for i in range(8)]
        for _ in range(n_ops // 16):
            for i in range(8):
                accs[i] = accs[i] + b
                accs[i] = accs[i] - b
        s = accs[0]
        for a in accs[1:]:
            s = s + a
        out_ref[:] = s


# ----------------------------------------------------------- dispatchers


def _chunked_call(kernel, seq, table, rows, grid, out_dtype=jnp.float32,
                  chunks=CC, bb=BB):
    view = seq.reshape(chunks, rows)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((chunks, bb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunks, bb), lambda i: (0, (i + 1) % grid),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunks, bb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((chunks, rows), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(table, view, view)


@functools.partial(jax.jit, static_argnames=("n_scores",))
def floor_score(seq, table, n_scores):
    lp = seq.shape[0]
    rows = lp // CC
    grid = rows // BB
    kernel = functools.partial(_floor_kernel, m=table.shape[0], rows=rows,
                               grid=grid, n_scores=n_scores)
    return _chunked_call(kernel, seq, table, rows, grid).reshape(-1)


@functools.partial(jax.jit, static_argnames=("n_scores",))
def g8_score(seq, table, n_scores):
    lp = seq.shape[0]
    rows = lp // 8
    grid = rows // G8_BB
    m, k = table.shape
    kernel = functools.partial(_g8_kernel, m=m, k=k, rows=rows, grid=grid,
                               n_scores=n_scores, bb=G8_BB)
    return _chunked_call(kernel, seq, table, rows, grid,
                         chunks=8, bb=G8_BB).reshape(-1)


@functools.partial(jax.jit, static_argnames=("n_ops", "dep"))
def cal(seq, bias, n_ops, dep):
    lp = seq.shape[0]
    rows = lp // CC
    grid = rows // BB
    kernel = functools.partial(_cal_kernel, n_ops=n_ops, dep=dep)
    view = seq.reshape(CC, rows)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((CC, BB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CC, BB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CC, rows), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(bias.reshape(1, 1), view).reshape(-1)


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
    oracle = pssm.score_host(seq)[:200_000]

    unit = CC * BB
    lp = -(-L // unit) * unit
    flat = np.full(lp, 4, dtype=np.int8)
    flat[:L] = genome
    sdev = jax.device_put(flat)

    # ---- prod baseline
    try:
        fn = lambda s, p, carry: kernels.score_f32(s, p + carry, n_scores)
        out = jax.device_get(fn(sdev, table, jnp.float32(0.0)))
        ok = bool(np.array_equal(out[:200_000], oracle))
        per, _ = repeat_time(lambda: (fn, (sdev, table), n_scores - 1),
                             r_lo=8, r_hi=128, trials=4)
        log({"case": "prod", "parity": ok,
             "gpos_per_s": round(n_scores / per / 1e9, 2)})
    except Exception as e:
        log({"case": "prod", "error": repr(e)[:300]})

    # ---- floor (no parity: lookup removed on purpose)
    try:
        fn = lambda s, p, carry: floor_score(s, p + carry, n_scores)
        jax.device_get(fn(sdev, table, jnp.float32(0.0)))
        per, _ = repeat_time(lambda: (fn, (sdev, table), n_scores - 1),
                             r_lo=8, r_hi=128, trials=4)
        log({"case": "floor", "gpos_per_s": round(n_scores / per / 1e9, 2)})
    except Exception as e:
        log({"case": "floor", "error": repr(e)[:300]})

    # ---- gather8 (exact: must match the oracle bit-for-bit)
    try:
        fn = lambda s, p, carry: g8_score(s, p + carry, n_scores)
        out = jax.device_get(fn(sdev, table, jnp.float32(0.0)))
        ok = bool(np.array_equal(out[:200_000], oracle))
        log({"case": "gather8", "parity": ok})
        per, _ = repeat_time(lambda: (fn, (sdev, table), n_scores - 1),
                             r_lo=8, r_hi=128, trials=4)
        log({"case": "gather8", "parity": ok,
             "gpos_per_s": round(n_scores / per / 1e9, 2)})
    except Exception as e:
        log({"case": "gather8", "error": repr(e)[:300]})

    # ---- VPU calibration
    for n_ops in (64,):
        for dep in (True, False):
            name = f"cal_{'dep' if dep else 'ind'}_{n_ops}"
            try:
                fn = lambda s, carry: cal(s, carry, n_ops, dep)
                jax.device_get(fn(sdev, jnp.float32(0.0)))
                per, _ = repeat_time(
                    lambda: (fn, (sdev,), 1000), r_lo=2, r_hi=16,
                    trials=4)
                tops = n_ops * lp / per / 1e12
                log({"case": name, "ms": round(per * 1e3, 2),
                     "t_elem_ops_per_s": round(tops, 2)})
            except Exception as e:
                log({"case": name, "error": repr(e)[:300]})

    log({"event": "done"})


if __name__ == "__main__":
    main()
