"""Background perf sweep of f32 scoring-kernel variants on the real chip.

Each variant must stay bit-exact vs the XLA reference (checked before
timing).  Results appended as JSON lines to perf_variants.out.

Variants:
  base      -- current production kernel (kernels.score_f32)
  nofull    -- K-1 selects (fold default symbol into the last select)
  fast4     -- no-N fast path: 3 selects (DNA symbols 0..3 only)
  rollacc   -- accumulator rolls right by 1 per j; lookups unshifted
  rollacc4  -- rollacc + fast4
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

from lightmotif_tpu.ops import kernels, xla_ops
from tools.perf import repeat_time

OUT = "/root/repo/experiments/perf_variants.out"


def log(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
    print(obj, flush=True)


def _variant_kernel(tab_ref, b0_ref, b1_ref, out_ref, *, m, k, rows, grid,
                    n_scores, block_lanes, chunks, fast4, rollacc, nofull):
    i = pl.program_id(0)
    w = m - 1

    b0 = b0_ref[:].astype(jnp.int32)
    if w:
        halo_src = b1_ref[:, :w].astype(jnp.int32)
        wrapped = pltpu.roll(halo_src, chunks - 1, axis=0)
        is_last = i == grid - 1
        halo = jnp.where(is_last, wrapped, halo_src)
        window = jnp.concatenate([b0, halo], axis=1)
    else:
        window = b0
    width = block_lanes + w

    keff = 4 if fast4 else k
    masks = [window == s for s in range(keff - 1)]

    def lookup(j):
        if nofull or fast4:
            val = jnp.where(masks[keff - 2], tab_ref[j, keff - 2],
                            tab_ref[j, keff - 1] if not fast4 else tab_ref[j, 3])
            lo = keff - 3
        else:
            val = jnp.full((chunks, width), tab_ref[j, k - 1])
            lo = keff - 2
        for s in range(lo, -1, -1):
            val = jnp.where(masks[s], tab_ref[j, s], val)
        return val

    if rollacc:
        acc = lookup(0)
        for j in range(1, m):
            acc = pltpu.roll(acc, 1, axis=1) + lookup(j)
        if w:
            acc = pltpu.roll(acc, width - w, axis=1)
        acc = acc[:, :block_lanes]
    else:
        acc = lookup(0)
        for j in range(1, m):
            acc = acc + pltpu.roll(lookup(j), width - j, axis=1)
        acc = acc[:, :block_lanes]

    c_ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, block_lanes), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, block_lanes), 1)
    pos = c_ids * rows + i * block_lanes + l_ids
    out_ref[:] = jnp.where(pos < n_scores, acc, -jnp.inf)


@functools.partial(jax.jit, static_argnames=(
    "n_scores", "chunks", "block_lanes", "fast4", "rollacc", "nofull"))
def variant_score(seq, table, n_scores, chunks, block_lanes,
                  fast4=False, rollacc=False, nofull=False):
    m, k = table.shape
    lp = seq.shape[0]
    rows = lp // chunks
    grid = rows // block_lanes
    view = seq.reshape(chunks, rows)
    kernel = functools.partial(
        _variant_kernel, m=m, k=k, rows=rows, grid=grid, n_scores=n_scores,
        block_lanes=block_lanes, chunks=chunks, fast4=fast4, rollacc=rollacc,
        nofull=nofull)
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

    log({"event": "start", "platform": jax.devices()[0].platform})

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

    # host oracle slice for parity
    oracle = pssm.score_host(seq)[:200_000]

    variants = {
        "base": {},
        "nofull": {"nofull": True},
        "fast4": {"fast4": True},
        "rollacc": {"rollacc": True, "nofull": True},
        "rollacc4": {"rollacc": True, "fast4": True},
    }

    C, B = kernels.CHUNKS, kernels.BLOCK_LANES
    for name, kw in variants.items():
        try:
            fn = lambda s, p, carry: variant_score(
                s, p + carry, n_scores, C, B, **kw)
            t0 = time.time()
            out = jax.device_get(fn(dseq.data, table, jnp.float32(0.0)))
            compile_s = time.time() - t0
            ok = bool(np.array_equal(out[:200_000], oracle))
            if not ok:
                bad = int(np.argmin(out[:200_000] == oracle))
                log({"variant": name, "parity": False, "first_bad": bad,
                     "got": float(out[bad]), "want": float(oracle[bad])})
                continue
            per_iter, raw = repeat_time(
                lambda: (fn, (dseq.data, table), n_scores - 1),
                r_lo=2, r_hi=12, trials=4)
            log({"variant": name, "parity": True, "compile_s": round(compile_s, 1),
                 "sec_per_scan": per_iter,
                 "gpos_per_s": round(n_scores / per_iter / 1e9, 2),
                 "vs_avx2": round(n_scores / per_iter / 1.029e9, 1)})
        except Exception as e:  # keep sweeping
            log({"variant": name, "error": repr(e)[:500]})

    log({"event": "done"})


if __name__ == "__main__":
    main()
