"""Sweep 9: (a) f32 gather-vs-select A/B (alternating, 3x each);
(b) Scanner end-to-end genome wall times at several hit densities;
(c) u8 prefilter and compaction costs in isolation.
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
from experiments.perf_variants2 import variant_score as select_score
from experiments.perf_variants8 import gather_score

OUT = "/root/repo/experiments/perf_variants9.out"


def log(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
    print(obj, flush=True)


def main():
    from lightmotif_tpu import CountMatrix, EncodedSequence
    from lightmotif_tpu.scanner import Scanner
    from lightmotif_tpu.ops import kernels, xla_ops
    from lightmotif_tpu.ops.pipeline import DeviceSequence

    dev = jax.devices()[0]
    log({"event": "start", "kind": getattr(dev, "device_kind", "?")})

    patterns = ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"]
    cm = CountMatrix.from_sequences(EncodedSequence.encode(p) for p in patterns)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    m = len(pssm)
    table = jnp.asarray(np.asarray(pssm.data, dtype=np.float32))
    tab8 = np.zeros((m, 8), np.float32)
    tab8[:, :5] = np.asarray(pssm.data, dtype=np.float32)
    tdev8 = jax.device_put(tab8)

    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    L = len(seq)
    n_scores = L - m + 1

    Cc, B = 256, 2048
    unit = Cc * B
    lp = -(-L // unit) * unit
    flat = np.full(lp, 4, dtype=np.int8)
    flat[:L] = genome
    sdev = jax.device_put(flat)

    # (a) alternating A/B
    sel_fn = lambda s, t, carry: select_score(s, t + carry, n_scores, Cc, B, "base")
    gat_fn = lambda s, t, carry: gather_score(s, t + carry, n_scores, Cc, B)
    for ab in range(3):
        for name, fn, args in [("select", sel_fn, (sdev, table)),
                               ("gather", gat_fn, (sdev, tdev8))]:
            per_iter, _ = repeat_time(lambda: (fn, args, n_scores - 1),
                                      r_lo=8, r_hi=128, trials=4)
            log({"ab": ab, "case": name,
                 "gpos_per_s": round(n_scores / per_iter / 1e9, 2)})

    # (b) scanner end-to-end wall time (warm)
    dist = pssm.score_distribution()
    for pv in (1e-7, 1e-5, 1e-3):
        t = dist.score(pv)
        sc = Scanner(pssm, seq, threshold=t)
        hits = sc.collect()  # warm-up/compile
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            sc2 = Scanner(pssm, seq, threshold=t)
            n = len(sc2.collect())
            times.append(time.perf_counter() - t0)
        best = min(times)
        log({"case": f"scanner_p{pv:g}", "threshold": round(t, 3),
             "hits": len(hits), "wall_s": round(best, 4),
             "eff_gpos_per_s": round(L / best / 1e9, 2)})

    # (c) u8 prefilter kernel alone + compaction alone
    dm = pssm.to_discrete()
    dm_dev = jnp.asarray(np.asarray(dm.data, dtype=np.uint8))
    u8_fn = lambda s, d, carry: kernels.score_u8(s, (d + carry).astype(jnp.uint8), n_scores)
    # carry perturbation trick needs float; use table add on a f32 copy
    u8f_fn = lambda s, d, carry: kernels.score_u8(s, d, n_scores) + carry.astype(jnp.int32)
    try:
        per_iter, _ = repeat_time(
            lambda: (u8f_fn, (sdev, dm_dev), n_scores - 1),
            r_lo=8, r_hi=128, trials=4)
        log({"case": "u8_prefilter", "gpos_per_s": round(n_scores / per_iter / 1e9, 2)})
    except Exception as e:
        log({"case": "u8_prefilter", "error": repr(e)[:300]})

    t_scaled = np.int32(dm.scale(dist.score(1e-5)))
    dsc = kernels.score_u8(sdev, dm_dev, n_scores)
    dsc = jax.device_put(jax.device_get(dsc))
    th_fn = lambda d, carry: xla_ops.threshold_positions(
        d + carry.astype(jnp.int32), t_scaled, 1 << 16)[1]
    try:
        per_iter, _ = repeat_time(
            lambda: (th_fn, (dsc,), 5),
            r_lo=8, r_hi=128, trials=4)
        log({"case": "compaction", "ms": round(per_iter * 1e3, 3)})
    except Exception as e:
        log({"case": "compaction", "error": repr(e)[:300]})

    log({"event": "done"})


if __name__ == "__main__":
    main()
