"""Sweep 6: can Mosaic do VPU table-lookup gathers / native i8 ops?

  gather_f32      -- lookup(j) = take(tab_row_j, window) (AVX2-permutevar
                     analogue); if supported, lookup cost ~1 op vs ~5.
  gather_flat     -- single [m*K] table, index = window + j*K.
  i8_probe        -- compile-only probes: int8 compare/select/add,
                     pltpu.roll on i8, bitcast i8<->i32 (for the u8 path).
All on [256, 2048]; r_lo=8, r_hi=128.
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

OUT = "/root/repo/experiments/perf_variants6.out"
CC, BB = 256, 2048


def log(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
    print(obj, flush=True)


def _gather_kernel(tabv_ref, b0_ref, b1_ref, out_ref, *, m, k, rows, grid,
                   n_scores, block_lanes, chunks, flat):
    i = pl.program_id(0)
    w = m - 1
    b0 = b0_ref[:].astype(jnp.int32)
    halo_src = b1_ref[:, :w].astype(jnp.int32)
    wrapped = pltpu.roll(halo_src, chunks - 1, axis=0)
    halo = jnp.where(i == grid - 1, wrapped, halo_src)
    window = jnp.concatenate([b0, halo], axis=1)
    width = block_lanes + w

    if flat:
        # single flat [m*K] table; index = j*K + s
        tab = tabv_ref[0]  # [m*K] padded row

        def lookup(j):
            return jnp.take(tab, window + j * k, axis=0)
    else:
        def lookup(j):
            return jnp.take(tabv_ref[j], window, axis=0)

    acc = lookup(0)
    for j in range(1, m):
        acc = acc + pltpu.roll(lookup(j), width - j, axis=1)
    acc = acc[:, :block_lanes]

    c_ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, block_lanes), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, block_lanes), 1)
    pos = c_ids * rows + i * block_lanes + l_ids
    out_ref[:] = jnp.where(pos < n_scores, acc, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("n_scores", "flat"))
def gather_score(seq, tabv, n_scores, flat=False):
    lp = seq.shape[0]
    if flat:
        m = 15
        k = 5
    else:
        m, k = 15, 5
    rows = lp // CC
    grid = rows // BB
    view = seq.reshape(CC, rows)
    kernel = functools.partial(
        _gather_kernel, m=m, k=k, rows=rows, grid=grid, n_scores=n_scores,
        block_lanes=BB, chunks=CC, flat=flat)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # table as VMEM vector(s)
            pl.BlockSpec((CC, BB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((CC, BB), lambda i: (0, (i + 1) % grid),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CC, BB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CC, rows), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tabv, view, view)
    return out.reshape(-1)


# -- i8 probes ---------------------------------------------------------------


def _i8_kernel(b0_ref, out_ref, *, op):
    x = b0_ref[:]
    if op == "i8_select":
        m0 = x == 0
        y = jnp.where(m0, jnp.int8(7), x)
        out_ref[:] = y
    elif op == "i8_add_sat":
        s = (x + x).astype(jnp.int8)
        out_ref[:] = jnp.where(s < x, jnp.int8(127), s)
    elif op == "i8_roll":
        out_ref[:] = pltpu.roll(x, 5, axis=1)
    elif op == "i8_bitcast":
        xi = pltpu.bitcast(x, jnp.int32)
        y = xi >> 8
        out_ref[:] = pltpu.bitcast(y, jnp.int8)
    elif op == "i8_gather":
        tab = jnp.arange(256, dtype=jnp.int8)
        out_ref[:] = jnp.take(tab, x.astype(jnp.int32), axis=0)


def i8_probe(op, flat):
    view = flat.reshape(CC, -1)

    @jax.jit
    def run(v):
        if op == "i8_bitcast":
            out_shape = jax.ShapeDtypeStruct(
                (CC, v.shape[1] // 4 * 4), jnp.int8)
            vv = v[:, :out_shape.shape[1]]
        else:
            out_shape = jax.ShapeDtypeStruct(v.shape, jnp.int8)
            vv = v
        return pl.pallas_call(
            functools.partial(_i8_kernel, op=op),
            out_shape=out_shape,
        )(vv)

    return jax.device_get(run(view))


def main():
    from lightmotif_tpu import CountMatrix, EncodedSequence

    dev = jax.devices()[0]
    log({"event": "start", "kind": getattr(dev, "device_kind", "?")})

    patterns = ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"]
    cm = CountMatrix.from_sequences(EncodedSequence.encode(p) for p in patterns)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    m = len(pssm)
    tabnp = np.asarray(pssm.data, dtype=np.float32)  # [15, 5]

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

    # table as [m, 128] VMEM rows (K in first lanes)
    tab_rows = np.zeros((m, 128), np.float32)
    tab_rows[:, :5] = tabnp
    # flat [1, m*K padded to 128]
    tab_flat = np.zeros((1, 128), np.float32)
    tab_flat[0, :75] = tabnp.reshape(-1)

    for name, tabv, fl in [("gather_f32", tab_rows, False),
                           ("gather_flat", tab_flat, True)]:
        try:
            tdev = jax.device_put(tabv)
            fn = lambda s, t, carry: gather_score(
                s, t + carry, n_scores, fl)
            t0 = time.time()
            out = jax.device_get(fn(sdev, tdev, jnp.float32(0.0)))
            compile_s = time.time() - t0
            scores = out[:200_000]
            exact = bool(np.array_equal(scores, oracle))
            if not exact:
                bad = int(np.argmin(scores == oracle))
                log({"case": name, "parity": False, "first_bad": bad,
                     "got": float(scores[bad]), "want": float(oracle[bad])})
                continue
            per_iter, raw = repeat_time(
                lambda: (fn, (sdev, tdev), n_scores - 1),
                r_lo=8, r_hi=128, trials=4)
            log({"case": name, "parity": exact,
                 "compile_s": round(compile_s, 1),
                 "us_per_scan": round(per_iter * 1e6, 1),
                 "gpos_per_s": round(n_scores / per_iter / 1e9, 2),
                 "vs_avx2": round(n_scores / per_iter / 1.029e9, 1)})
        except Exception as e:
            log({"case": name, "error": repr(e)[:400]})

    for op in ["i8_select", "i8_add_sat", "i8_roll", "i8_bitcast", "i8_gather"]:
        try:
            i8_probe(op, flat[:CC * 512])
            log({"probe": op, "ok": True})
        except Exception as e:
            log({"probe": op, "ok": False, "error": repr(e)[:300]})

    log({"event": "done"})


if __name__ == "__main__":
    main()
