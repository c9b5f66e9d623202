"""Round-2 sweep: fused multi-motif prefilter optimization.

HISTORICAL (round-2 measurement artifact): variants v0/v2 bench the
``prefilter_bits`` kernel deleted in round 3 -- run against a round-2
checkout to reproduce; kept as provenance for RESULTS.md/DESIGN.md.

VERDICT task 2: close 246 Gpm/s at M=1024 toward the ~960 MXU-side
ceiling.  Cost model of the round-1 kernel per [2048, M] tile:

* main matmul        [2048,128]@[128,M]      ~6 ms/genome @ M=1024
* bitpack matmul     [2048,M]@[M,64->128pad] ~6 ms (N pads to 128!)
* window construction (tree shifts)          ~2.8 ms
* [tile, M] mask elementwise (5 passes)      ~10 ms   <- biggest
* HBM bits write                             ~1.5 ms

Variants measured here:

* v0     production prefilter_bits (baseline)
* vany   "any-candidate" kernel: threshold folded into the matmul via a
         constant-one lane (part = scores - t), row-max reduction to a
         [tile, 1] i32 output -- no bitpack matmul, no [tile, M] mask
         passes, 32x less HBM.  Per-motif bits for the surviving
         positions are recovered downstream from a sparse [cap, 128]
         one-hot matmul (cost ~0.1 ms).
* vany_t4096 / vany_t8192  tile-size sweep of vany
* vbits2 bits output kept, but validity-mask guarded to tail tiles and
         compare fused straight to bf16 (isolates the mask-pass cost)
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
from lightmotif_tpu.ops import multi_kernel

OUT = "/root/repo/experiments/multi_opt.out"
MAX_MK = 128
NEG_GUARD = 65536.0  # > any raw u8 sum (15*255); bf16-exact power of two


def log(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
    print(obj, flush=True)


# ---------------------------------------------------------------- vany


def _any_kernel(filt_ref, b0_ref, b1_ref, out_ref, *, m_max, k, tile):
    w = m_max - 1
    s0 = b0_ref[:].astype(jnp.int32)
    halo = b1_ref[:w, :].astype(jnp.int32)
    seq = jnp.concatenate([s0, halo], axis=0)
    rows = tile + w
    lanes = 8
    rpb = MAX_MK // lanes
    base = jnp.broadcast_to(seq, (rows, MAX_MK))
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, MAX_MK), 1)
    group = lane // lanes
    smap = jax.lax.broadcasted_iota(jnp.int32, (tile, MAX_MK), 1) % lanes
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (tile, MAX_MK), 1)
    n_blocks = -(-m_max // rpb)
    scores = None
    for b in range(n_blocks):
        block_base = base if b == 0 else pltpu.roll(base, rows - b * rpb, 0)
        rows_here = min(m_max - b * rpb, rpb)
        seqw = block_base
        bit = 1
        while bit < rows_here:
            seqw = jnp.where((group & bit) != 0,
                             pltpu.roll(seqw, rows - bit, 0), seqw)
            bit <<= 1
        x = seqw[:tile] == smap
        if b == 0:
            # constant-one lane (j=0, s=7: never a real symbol); its
            # filter row is -t, so the matmul emits scores - t directly
            x = x | (lane_t == 7)
        part = jnp.dot(
            x.astype(jnp.bfloat16), filt_ref[b * MAX_MK:(b + 1) * MAX_MK, :],
            preferred_element_type=jnp.float32,
        )
        scores = part if scores is None else scores + part
    out_ref[:] = jnp.max(scores, axis=1, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("m_max", "k", "tile"))
def prefilter_any(seq, filters_t, m_max: int, k: int, tile: int):
    lp = seq.shape[0]
    grid = lp // tile
    view = seq.reshape(lp, 1)
    kernel = functools.partial(_any_kernel, m_max=m_max, k=k, tile=tile)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: ((i + 1) % grid, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lp, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(filters_t, view, view)


# -------------------------------------------------------------- vbits2


def _bits2_kernel(filt_ref, tsc_ref, nval_ref, pow_ref, b0_ref, b1_ref,
                  out_ref, *, m_max, k, tile, guard_tile):
    i = pl.program_id(0)
    w = m_max - 1
    s0 = b0_ref[:].astype(jnp.int32)
    halo = b1_ref[:w, :].astype(jnp.int32)
    seq = jnp.concatenate([s0, halo], axis=0)
    rows = tile + w
    lanes = 8
    rpb = MAX_MK // lanes
    base = jnp.broadcast_to(seq, (rows, MAX_MK))
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, MAX_MK), 1)
    group = lane // lanes
    smap = jax.lax.broadcasted_iota(jnp.int32, (tile, MAX_MK), 1) % lanes
    n_blocks = -(-m_max // rpb)
    scores = None
    for b in range(n_blocks):
        block_base = base if b == 0 else pltpu.roll(base, rows - b * rpb, 0)
        rows_here = min(m_max - b * rpb, rpb)
        seqw = block_base
        bit = 1
        while bit < rows_here:
            seqw = jnp.where((group & bit) != 0,
                             pltpu.roll(seqw, rows - bit, 0), seqw)
            bit <<= 1
        x = (seqw[:tile] == smap).astype(jnp.bfloat16)
        part = jnp.dot(
            x, filt_ref[b * MAX_MK:(b + 1) * MAX_MK, :],
            preferred_element_type=jnp.float32,
        )
        scores = part if scores is None else scores + part

    one = jnp.bfloat16(1.0)
    zero = jnp.bfloat16(0.0)

    @pl.when(i < guard_tile)
    def _():
        b16 = jnp.where(scores >= tsc_ref[:], one, zero)
        out_ref[:] = jnp.dot(
            b16, pow_ref[:], preferred_element_type=jnp.float32
        ).astype(jnp.int32)

    @pl.when(i >= guard_tile)
    def _():
        pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) + i * tile
        mask = (scores >= tsc_ref[:]) & (pos < nval_ref[:])
        out_ref[:] = jnp.dot(
            mask.astype(jnp.bfloat16), pow_ref[:],
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("m_max", "k", "tile",
                                             "guard_tile"))
def prefilter_bits2(seq, filters, t_scaled, n_valid, m_max: int, k: int,
                    tile: int, guard_tile: int):
    lp = seq.shape[0]
    n_motifs = filters.shape[1]
    grid = lp // tile
    n_words = n_motifs // 16
    powers = np.zeros((n_motifs, n_words), np.float32)
    for mo in range(n_motifs):
        powers[mo, mo // 16] = float(1 << (mo % 16))
    view = seq.reshape(lp, 1)
    kernel = functools.partial(_bits2_kernel, m_max=m_max, k=k, tile=tile,
                               guard_tile=guard_tile)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: ((i + 1) % grid, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, n_words), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lp, n_words), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(filters.astype(jnp.bfloat16), t_scaled, n_valid,
      jnp.asarray(powers, jnp.bfloat16), view, view)


# ---------------------------------------------------------------- main


def main():
    log({"event": "start", "t": time.time()})
    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    L = genome.size
    m, k = 15, 5

    for M in (128, 1024):
        dms = rng.integers(0, 200, size=(M, m, k)).astype(np.float32)
        dms[:, :, 4] = 0.0
        # manual packing (like the round-1 bench): raw thresholds kept
        # finite so sparsity is realistic (~1e-4 of positions)
        m_pad = -(-M // 16) * 16
        filters = np.zeros((MAX_MK, m_pad), np.float32)
        for j in range(m):
            filters[j * 8:j * 8 + k, :M] = dms[:, j, :].T
        t_eff = np.full((1, m_pad), np.inf, np.float32)
        t_eff[0, :M] = 2400.0
        n_valid = np.zeros((1, m_pad), np.int32)
        n_valid[0, :M] = L - m + 1

        # threshold-folded filters for vany: row 7 = -t (finite guard)
        filters_t = filters.copy()
        t_fin = np.where(np.isfinite(t_eff[0]), t_eff[0], NEG_GUARD)
        filters_t[7, :] = -t_fin

        for tile in (2048, 4096, 8192):
            lp = -(-L // tile) * tile
            flat = np.full(lp, 4, dtype=np.int8)
            flat[:L] = genome
            sdev = jax.device_put(flat)
            ft_dev = jax.device_put(filters_t)
            f_dev = jax.device_put(filters)
            te_dev = jax.device_put(t_eff)
            nv_dev = jax.device_put(n_valid)

            # ---- vany
            name = f"vany_M{M}_t{tile}"
            try:
                fn = lambda s, f, carry: prefilter_any(
                    s, f + carry, m, k, tile)
                t0 = time.time()
                mx = jax.device_get(fn(sdev, ft_dev, jnp.float32(0.0)))
                compile_s = time.time() - t0
                # correctness vs prefilter_bits (any = any bit set)
                if tile == 2048 and M == 128:
                    bits = jax.device_get(multi_kernel.prefilter_bits(
                        sdev, f_dev, te_dev, nv_dev, m, k))
                    any_ref = (bits != 0).any(axis=1)
                    any_new = mx[:, 0] >= 0
                    # vany skips the n_valid mask: allow extras only in
                    # the invalid tail
                    nv1 = L - m + 1
                    agree = np.array_equal(any_ref[:nv1], any_new[:nv1])
                    log({"case": name, "parity_head": bool(agree),
                         "extras_tail": int(any_new[nv1:].sum())})
                    if not agree:
                        bad = int(np.argmin(any_ref[:nv1] == any_new[:nv1]))
                        log({"case": name, "bad_at": bad,
                             "ref": bool(any_ref[bad]),
                             "new": bool(any_new[bad])})
                        continue
                per_iter, _ = repeat_time(
                    lambda: (fn, (sdev, ft_dev), 100), r_lo=4, r_hi=64,
                    trials=4)
                log({"case": name, "compile_s": round(compile_s, 1),
                     "ms": round(per_iter * 1e3, 2),
                     "gpm_per_s": round(L * M / per_iter / 1e9, 1)})
            except Exception as e:
                log({"case": name, "error": repr(e)[:300]})

        # ---- vbits2 at tile=2048 only
        tile = 2048
        lp = -(-L // tile) * tile
        flat = np.full(lp, 4, dtype=np.int8)
        flat[:L] = genome
        sdev = jax.device_put(flat)
        f_dev = jax.device_put(filters)
        te_dev = jax.device_put(t_eff)
        nv_dev = jax.device_put(n_valid)
        guard = (L - m + 1) // tile
        name = f"vbits2_M{M}"
        try:
            fn = lambda s, f, carry: prefilter_bits2(
                s, f + carry, te_dev, nv_dev, m, k, tile, guard)
            bits2 = jax.device_get(fn(sdev, f_dev, jnp.float32(0.0)))
            bits = jax.device_get(multi_kernel.prefilter_bits(
                sdev, f_dev, te_dev, nv_dev, m, k))
            ok = np.array_equal(bits2, bits)
            log({"case": name, "parity": bool(ok)})
            if ok:
                per_iter, _ = repeat_time(
                    lambda: (fn, (sdev, f_dev), 100), r_lo=4, r_hi=64,
                    trials=4)
                log({"case": name, "ms": round(per_iter * 1e3, 2),
                     "gpm_per_s": round(L * M / per_iter / 1e9, 1)})
        except Exception as e:
            log({"case": name, "error": repr(e)[:300]})

        # ---- v0 baseline re-measure
        name = f"v0_M{M}"
        try:
            fn = lambda s, f, carry: multi_kernel.prefilter_bits(
                s, f + carry, te_dev, nv_dev, m, k)
            jax.device_get(fn(sdev, f_dev, jnp.float32(0.0)))
            per_iter, _ = repeat_time(
                lambda: (fn, (sdev, f_dev), 100), r_lo=4, r_hi=64, trials=4)
            log({"case": name, "ms": round(per_iter * 1e3, 2),
                 "gpm_per_s": round(L * M / per_iter / 1e9, 1)})
        except Exception as e:
            log({"case": name, "error": repr(e)[:300]})

    log({"event": "done"})


if __name__ == "__main__":
    main()
