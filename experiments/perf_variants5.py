"""Sweep 5: re-measure everything with trustworthy repetition counts.

Earlier sweeps used r_lo=2, r_hi=12 in-jit reps; at 30-180 us/scan the
10-rep delta (<2 ms) drowned in ~30 ms tunnel RTT jitter and best-of
-trials picked lucky samples (fake 131/239 Gpos/s readings).  Here every
case runs r_lo=8, r_hi=128, twice, and reports both runs.
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
from experiments.perf_variants import variant_score
from experiments.perf_variants2 import variant_score as v2_score
from experiments.perf_variants3 import base_score

OUT = "/root/repo/experiments/perf_variants5.out"


def log(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
    print(obj, flush=True)


def main():
    from lightmotif_tpu import CountMatrix, EncodedSequence

    dev = jax.devices()[0]
    log({"event": "start", "kind": getattr(dev, "device_kind", "?")})

    patterns = ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"]
    cm = CountMatrix.from_sequences(EncodedSequence.encode(p) for p in patterns)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    m = len(pssm)
    table = jnp.asarray(np.asarray(pssm.data, dtype=np.float32))

    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    L = len(seq)
    n_scores = L - m + 1
    oracle = pssm.score_host(seq)[:200_000]

    # case: (name, builder(flat, lp) -> (fn(args..., carry), args, check))
    def chunked_input(Cc, B):
        unit = Cc * B
        lp = max(unit, -(-L // unit) * unit)
        flat = np.full(lp, 4, dtype=np.int8)
        flat[:L] = genome
        return jax.device_put(flat)

    cases = []

    def add_v1(name, Cc, B, **kw):
        sdev = chunked_input(Cc, B)
        fn = lambda s, p, carry: variant_score(
            s, p + carry, n_scores, Cc, B, **kw)
        cases.append((name, fn, (sdev, table), True))

    def add_v2(name, Cc, B, mode):
        sdev = chunked_input(Cc, B)
        fn = lambda s, p, carry: v2_score(
            s, p + carry, n_scores, Cc, B, mode)
        cases.append((name, fn, (sdev, table),
                      not mode.startswith("diag")))

    add_v1("prod_512x1024", 512, 1024)
    add_v2("base_256x2048", 256, 2048, "base")
    add_v2("noroll_512x1024", 512, 1024, "diag_noroll")
    add_v2("addonly_512x1024", 512, 1024, "diag_addonly")
    add_v1("fast4_512x1024", 512, 1024, fast4=True)
    add_v2("noroll_256x2048", 256, 2048, "diag_noroll")

    for rep in range(2):
        for name, fn, args, check in cases:
            try:
                t0 = time.time()
                out = jax.device_get(fn(*args, jnp.float32(0.0)))
                compile_s = time.time() - t0
                if check and rep == 0:
                    scores = out[:200_000]
                    if not np.array_equal(scores, oracle):
                        bad = int(np.argmin(scores == oracle))
                        log({"case": name, "parity": False, "first_bad": bad})
                        continue
                per_iter, raw = repeat_time(
                    lambda: (fn, args, n_scores - 1),
                    r_lo=8, r_hi=128, trials=4)
                log({"case": name, "rep": rep,
                     "compile_s": round(compile_s, 1),
                     "raw": {str(kk): round(vv, 5) for kk, vv in raw.items()},
                     "us_per_scan": round(per_iter * 1e6, 1),
                     "gpos_per_s": round(n_scores / per_iter / 1e9, 2),
                     "vs_avx2": round(n_scores / per_iter / 1.029e9, 1)})
            except Exception as e:
                log({"case": name, "rep": rep, "error": repr(e)[:300]})

    log({"event": "done"})


if __name__ == "__main__":
    main()
