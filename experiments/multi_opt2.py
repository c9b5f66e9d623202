"""Round-2 sweep B: transposed window construction for the any-prefilter.

Construction currently builds X[t, (j,s)] (positions on sublanes) via a
4-level binary shift tree: ~11 elementwise passes over [tile, 128].
The transposed form X^T[(j,s), t] puts positions on LANES, where the
per-j shift is a plain lane roll of an [8, width] block and the 16
blocks concatenate on the sublane axis (8-row granularity, vreg
aligned):

  base8 = broadcast(seq_row)                  [8, width]   1 pass
  blocks[b] = roll(base8, -b lanes)           16 x [8, w] ~1 pass total
  xt = concat(blocks, axis=0)                 [128, width] layout
  oh = (xt == r%8) | (r == lanes-1 constant)  1-2 passes

The matmul flips to W^T[m_pad, 128] @ oh[128, tile] -> scores^T
[m_pad, tile]; the candidate reduction becomes a sublane max to
[1, tile].  Expected: construction 2.8 -> ~1.2 ms/genome, lifting
M=128 from ~68 and M=1024 from ~494 Gpos*motif/s.
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

OUT = "/root/repo/experiments/multi_opt2.out"
MAX_MK = 128


def log(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
    print(obj, flush=True)


def _anyT_kernel(filt_ref, b0_ref, b1_ref, out_ref, *, m_max, k, tile):
    """Transposed-construction any-prefilter (lanes = positions)."""
    w = m_max - 1
    lanes = 8
    rpb = MAX_MK // lanes
    width = tile + w
    # sequence as one lane-major row: input blocks are [1, tile]
    s0 = b0_ref[:].astype(jnp.int32)          # [1, tile]
    halo = b1_ref[:, :w].astype(jnp.int32)    # [1, w] next tile's head
    seq_row = jnp.concatenate([s0, halo], axis=1)  # [1, width]
    base8 = jnp.broadcast_to(seq_row, (lanes, width))
    n_blocks = -(-m_max // rpb)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (MAX_MK, 1), 0)
    smap = sub_iota % lanes        # row r compares symbol r % 8
    is_const = sub_iota == (lanes - 1)  # block0 top slot: constant one

    scores = None
    for b in range(n_blocks):
        blocks = []
        for r in range(rpb):
            j = b * rpb + r
            shift = (width - j) % width
            blocks.append(base8 if j == 0 else
                          pltpu.roll(base8, shift, axis=1))
        # sublane concat crashes Mosaic; stack+reshape compiles
        xt = jnp.stack(blocks, axis=0).reshape(MAX_MK, width)
        oh = xt[:, :tile] == smap
        if b == 0:
            oh = oh | is_const
        part = jax.lax.dot_general(
            filt_ref[b * MAX_MK:(b + 1) * MAX_MK, :],
            oh.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [M, tile] = W^T[(j,s), M]^T ... contract the 128 dim
        scores = part if scores is None else scores + part
    out_ref[:] = jnp.max(scores, axis=0, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("m_max", "k", "tile"))
def prefilter_anyT(seq, filters_t, m_max: int, k: int, tile: int):
    lp = seq.shape[0]
    grid = lp // tile
    view = seq.reshape(1, lp)
    kernel = functools.partial(_anyT_kernel, m_max=m_max, k=k, tile=tile)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, (i + 1) % grid),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, lp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(filters_t, view, view)


def main():
    log({"event": "start", "t": time.time()})
    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    L = genome.size
    m, k = 15, 5

    for M in (128, 1024):
        dms = rng.integers(0, 200, size=(M, m, k)).astype(np.float32)
        dms[:, :, 4] = 0.0
        filters_t = multi_kernel.pack_filters_any(
            dms, np.full(M, 2400, np.int64), k)
        filters_t[multi_kernel._lanes_for(k) - 1, :] = -2400.0

        for tile in (8192, 16384, 32768):
            lp = -(-L // tile) * tile
            flat = np.full(lp, 4, dtype=np.int8)
            flat[:L] = genome
            sdev = jax.device_put(flat)
            fdev = jax.device_put(filters_t)

            name = f"vanyT_M{M}_t{tile}"
            try:
                fn = lambda s, f, carry: prefilter_anyT(
                    s, f + carry, m, k, tile)
                t0 = time.time()
                mx = jax.device_get(fn(sdev, fdev, jnp.float32(0.0)))
                compile_s = time.time() - t0
                if M == 128 and tile == 8192:
                    ref = jax.device_get(multi_kernel.prefilter_any(
                        sdev, fdev, m, k))
                    agree = np.array_equal(ref[:, 0] >= 0, mx[0] >= 0)
                    log({"case": name, "parity_vs_prod": bool(agree)})
                    if not agree:
                        bad = int(np.argmin((ref[:, 0] >= 0) == (mx[0] >= 0)))
                        log({"case": name, "bad_at": bad,
                             "ref": int(ref[bad, 0]), "new": int(mx[0, bad])})
                        continue
                per, _ = repeat_time(
                    lambda: (fn, (sdev, fdev), 100), r_lo=8, r_hi=128,
                    trials=4)
                log({"case": name, "compile_s": round(compile_s, 1),
                     "ms": round(per * 1e3, 2),
                     "gpm_per_s": round(L * M / per / 1e9, 1)})
            except Exception as e:
                log({"case": name, "error": repr(e)[:300]})

        # production baseline at the same M for reference
        tile = multi_kernel.TILE
        lp = -(-L // tile) * tile
        flat = np.full(lp, 4, dtype=np.int8)
        flat[:L] = genome
        sdev = jax.device_put(flat)
        fdev = jax.device_put(filters_t)
        fn = lambda s, f, carry: multi_kernel.prefilter_any(
            s, f + carry, m, k)
        try:
            jax.device_get(fn(sdev, fdev, jnp.float32(0.0)))
            per, _ = repeat_time(lambda: (fn, (sdev, fdev), 100),
                                 r_lo=8, r_hi=128, trials=4)
            log({"case": f"prod_M{M}", "ms": round(per * 1e3, 2),
                 "gpm_per_s": round(L * M / per / 1e9, 1)})
        except Exception as e:
            log({"case": f"prod_M{M}", "error": repr(e)[:300]})

    log({"event": "done"})


if __name__ == "__main__":
    main()
