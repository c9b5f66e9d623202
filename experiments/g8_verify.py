"""Verify the gather8 result with wide rep spans + FULL-genome parity.

The round-1 timing pitfall (rep span < 10 ms -> phantom speedups)
demands re-measurement: gather8's first reading (102.6 Gpos/s,
r_hi=128) spans only ~5.4 ms.  Here: r_hi up to 1024 (span ~45 ms),
two independent repeats, block-size sweep, and bit-exact parity on all
4,641,638 genome positions.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tools.perf import repeat_time
from experiments.f32_probe import g8_score, _g8_kernel, _chunked_call
import experiments.f32_probe as fp
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = "/root/repo/experiments/g8_verify.out"


def log(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
    print(obj, flush=True)


@functools.partial(jax.jit, static_argnames=("n_scores", "bb"))
def g8_score_bb(seq, table, n_scores, bb):
    lp = seq.shape[0]
    rows = lp // 8
    grid = rows // bb
    m, k = table.shape
    kernel = functools.partial(_g8_kernel, m=m, k=k, rows=rows, grid=grid,
                               n_scores=n_scores, bb=bb)
    return _chunked_call(kernel, seq, table, rows, grid,
                         chunks=8, bb=bb).reshape(-1)


def _g8v_kernel(tab_ref, b0_ref, b1_ref, out_ref, *, m, k, rows, grid,
                n_scores, bb, guard, variant):
    """gather kernel variants: 'guard' tail-guards the validity mask,
    'slice' replaces the accumulate-side roll with a lane-offset slice."""
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

    if variant == "slice":
        acc = lookup(0)[:, :bb]
        for j in range(1, m):
            acc = acc + jax.lax.slice(lookup(j), (0, j), (8, j + bb))
    else:
        acc = lookup(0)
        for j in range(1, m):
            acc = acc + pltpu.roll(lookup(j), width - j, axis=1)
        acc = acc[:, :bb]

    if variant == "guard":
        @pl.when(i < guard)
        def _():
            out_ref[:] = acc

        @pl.when(i >= guard)
        def _():
            c_ids = jax.lax.broadcasted_iota(jnp.int32, (8, bb), 0)
            l_ids = jax.lax.broadcasted_iota(jnp.int32, (8, bb), 1)
            pos = c_ids * rows + i * bb + l_ids
            out_ref[:] = jnp.where(pos < n_scores, acc, -jnp.inf)
    else:
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (8, bb), 0)
        l_ids = jax.lax.broadcasted_iota(jnp.int32, (8, bb), 1)
        pos = c_ids * rows + i * bb + l_ids
        out_ref[:] = jnp.where(pos < n_scores, acc, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("n_scores", "bb", "variant"))
def g8v_score(seq, table, n_scores, bb, variant):
    lp = seq.shape[0]
    rows = lp // 8
    grid = rows // bb
    m, k = table.shape
    guard = max(0, min(grid - 1, (n_scores - 7 * rows) // bb))
    kernel = functools.partial(_g8v_kernel, m=m, k=k, rows=rows, grid=grid,
                               n_scores=n_scores, bb=bb, guard=guard,
                               variant=variant)
    return _chunked_call(kernel, seq, table, rows, grid,
                         chunks=8, bb=bb).reshape(-1)


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
    # sprinkle wildcards to exercise the K-1 lookup path
    wpos = rng.integers(0, genome.size, size=1000)
    genome[wpos] = 4
    seq = EncodedSequence(genome.astype(np.uint8))
    L = len(seq)
    n_scores = L - m + 1

    t0 = time.time()
    oracle = pssm.score_host(seq)
    log({"event": "oracle", "s": round(time.time() - t0, 1)})

    unit = 8 * 65536
    lp = -(-L // unit) * unit
    flat = np.full(lp, 4, dtype=np.int8)
    flat[:L] = genome
    sdev = jax.device_put(flat)

    for bb in (16384, 32768, 65536):
        name = f"g8_bb{bb}"
        try:
            fn = lambda s, p, carry: g8_score_bb(s, p + carry, n_scores, bb)
            out = jax.device_get(fn(sdev, table, jnp.float32(0.0)))
            full_ok = bool(np.array_equal(out[:n_scores], oracle))
            log({"case": name, "full_genome_parity": full_ok})
            if not full_ok:
                bad = int(np.argmin(out[:n_scores] == oracle))
                log({"case": name, "first_mismatch": bad,
                     "got": float(out[bad]), "want": float(oracle[bad])})
                continue
            for rep in range(2):
                per, raw = repeat_time(
                    lambda: (fn, (sdev, table), n_scores - 1),
                    r_lo=32, r_hi=1024, trials=3)
                log({"case": name, "rep": rep,
                     "span_ms": round((raw[1024] - raw[32]) * 1e3, 1),
                     "gpos_per_s": round(n_scores / per / 1e9, 2),
                     "vs_avx2": round(n_scores / per / 1.029e9, 1)})
        except Exception as e:
            log({"case": name, "error": repr(e)[:300]})

    # refinement variants at the best plain geometry
    for bb, variant in ((32768, "guard"), (32768, "slice"),
                        (65536, "guard")):
        name = f"g8_{variant}_bb{bb}"
        try:
            fn = lambda s, p, carry: g8v_score(
                s, p + carry, n_scores, bb, variant)
            out = jax.device_get(fn(sdev, table, jnp.float32(0.0)))
            full_ok = bool(np.array_equal(out[:n_scores], oracle))
            log({"case": name, "full_genome_parity": full_ok})
            if not full_ok:
                continue
            per, raw = repeat_time(
                lambda: (fn, (sdev, table), n_scores - 1),
                r_lo=32, r_hi=1024, trials=3)
            log({"case": name,
                 "span_ms": round((raw[1024] - raw[32]) * 1e3, 1),
                 "gpos_per_s": round(n_scores / per / 1e9, 2),
                 "vs_avx2": round(n_scores / per / 1.029e9, 1)})
        except Exception as e:
            log({"case": name, "error": repr(e)[:300]})

    log({"event": "done"})


if __name__ == "__main__":
    main()
