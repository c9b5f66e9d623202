"""Multi-motif scoring: explicit-windows matmul vs XLA conv.

The current ``score_multi_u8`` materializes X[p, m*K] (im2col) in HBM
(~700 MB for a genome x 15-row motifs); ``lax.conv_general_dilated``
does the same contraction with implicit im2col on the MXU.  Exactness
holds either way: one-hot 0/1 and u8 integers are exact in bf16, all
partial sums are integers < 2^24 in f32 -- order never matters.

Metric: positions x motifs / second.
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

from tools.perf import repeat_time
from lightmotif_tpu.ops import multi

OUT = "/root/repo/experiments/multi_bench.out"


def log(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
    print(obj, flush=True)


@functools.partial(jax.jit, static_argnames=())
def conv_multi_u8(seq, filters):
    """Discrete scores via conv: ``filters`` f32/bf16 ``[m, K, M]``."""
    k = filters.shape[1]
    onehot = (
        seq.astype(jnp.int32)[None, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2)
    ).astype(jnp.bfloat16)  # [1, Lp, K]
    out = jax.lax.conv_general_dilated(
        onehot,
        filters.astype(jnp.bfloat16),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )  # [1, Lp-m+1, M]
    return jnp.minimum(out[0].astype(jnp.int32), 255)


def main():
    from lightmotif_tpu import CountMatrix, EncodedSequence

    dev = jax.devices()[0]
    log({"event": "start", "kind": getattr(dev, "device_kind", "?")})

    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    L = genome.size
    lp = -(-L // 8192) * 8192
    flat = np.full(lp, 4, dtype=np.int8)
    flat[:L] = genome
    sdev = jax.device_put(flat)

    m, k = 15, 5
    for M in (16, 128, 512):
        # random u8 discrete matrices
        dms = rng.integers(0, 256, size=(M, m, k)).astype(np.float32)
        dms[:, :, 4] = 0.0
        lengths = np.full(M, m, np.int32)
        n_valid = np.full(M, L - m + 1, np.int32)

        # (a) explicit windows matmul
        try:
            fn = lambda s, d, carry: multi.score_multi_u8(
                s, d + carry, jnp.asarray(lengths), jnp.asarray(n_valid))
            args = (sdev, jnp.asarray(dms))
            out_a = jax.device_get(fn(*args, jnp.float32(0.0)))[:1000]
            per_iter, _ = repeat_time(lambda: (fn, args, 500),
                                      r_lo=4, r_hi=64, trials=4)
            log({"case": f"windows_M{M}",
                 "gpm_per_s": round(L * M / per_iter / 1e9, 1),
                 "ms": round(per_iter * 1e3, 2)})
        except Exception as e:
            out_a = None
            log({"case": f"windows_M{M}", "error": repr(e)[:300]})

        # (b) conv
        try:
            filters = np.transpose(dms, (1, 2, 0))  # [m, K, M]
            fnc = lambda s, f, carry: conv_multi_u8(s, f + carry)
            argsc = (sdev, jnp.asarray(filters))
            out_b = jax.device_get(fnc(*argsc, jnp.float32(0.0)))[:1000]
            if out_a is not None:
                ok = bool(np.array_equal(out_a[:1000], out_b[:1000]))
                if not ok:
                    log({"case": f"conv_M{M}", "parity_vs_windows": False})
            per_iter, _ = repeat_time(lambda: (fnc, argsc, 500),
                                      r_lo=4, r_hi=64, trials=4)
            log({"case": f"conv_M{M}",
                 "gpm_per_s": round(L * M / per_iter / 1e9, 1),
                 "ms": round(per_iter * 1e3, 2)})
        except Exception as e:
            log({"case": f"conv_M{M}", "error": repr(e)[:300]})

    log({"event": "done"})


if __name__ == "__main__":
    main()
