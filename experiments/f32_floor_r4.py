"""Round-4 close-out of the f32 kernel floor (VERDICT #2).

Three independent measurements:

1. the production kernel at >=150 ms spans (baseline re-check);
2. lane-roll throughput on THREE tile families ([8, W], [16, W],
   [32, W]) and two shift values (1 and 7), serial chains -- if the
   1.9 cyc/vreg rate is a property of the cross-lane unit it must
   reproduce across layouts and shifts;
3. an xprof device trace attempt (jax.profiler) -- expected to fail on
   the axon tunnel; recorded either way.

Also re-derives the floor INCLUDING the io/epilogue floor measured by
the empty-body kernel: the round-3 "36 Gpos/s" counted only the m-1
rolls; with the ~5-6 cyc/vreg io floor the bound is ~32 cyc/vreg.
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightmotif_tpu import CountMatrix, EncodedSequence
from lightmotif_tpu.ops import kernels, xla_ops
from tools.perf import repeat_time

PATTERNS = ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"]


def bench_kernel():
    cm = CountMatrix.from_sequences(
        EncodedSequence.encode(p) for p in PATTERNS)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    n_scores = genome.size - len(pssm) + 1
    lp = xla_ops.pad_length(genome.size, kernels.PAD_LANES)
    flat = np.full(lp, 4, np.int8)
    flat[: genome.size] = genome
    sdev = jax.device_put(flat)
    pdev = jnp.asarray(np.asarray(pssm.data, np.float32))

    def make():
        fn = lambda s, p, c: kernels.score_f32(s, p + c, n_scores)
        return fn, (sdev, pdev), n_scores - 1
    per, spans = repeat_time(make, r_lo=512, r_hi=2048, trials=3)
    print(f"kernel m=15: {n_scores/per/1e9:.2f} Gpos/s "
          f"({per*1e6:.1f} us/pass) spans={spans}", flush=True)


def _roll_kernel(x_ref, o_ref, *, n, shift):
    acc = x_ref[:]
    for _ in range(n):
        acc = pltpu.roll(acc, shift, axis=1)
        acc = acc + 1.0  # serialize (add measured separately at ~0.6)
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("rows", "n", "shift"))
def roll_chain(x, rows, n, shift):
    return pl.pallas_call(
        functools.partial(_roll_kernel, n=n, shift=shift),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def bench_rolls():
    for rows in (8, 16, 32):
        w = 65536 * 8 // rows  # constant data volume = 64 vregs' worth
        x = np.ones((rows, w), np.float32)
        for shift in (1, 7):
            outs = {}
            for n in (16, 48):
                def make():
                    fn = lambda a, c: roll_chain(a + c, rows, n, shift)
                    return fn, (x,), 0
                per, spans = repeat_time(make, r_lo=64, r_hi=512,
                                         trials=3)
                outs[n] = per
            n_vregs = rows * w / 1024
            dcyc = (outs[48] - outs[16]) / 32 * 940e6 / n_vregs
            print(f"[{rows:2d}, {w}] shift={shift}: roll+add = "
                  f"{dcyc:.2f} cyc/vreg (expect ~1.9 + ~0.6)",
                  flush=True)


def try_xprof():
    import glob
    import tempfile

    d = tempfile.mkdtemp()
    try:
        x = jnp.ones((8, 65536), jnp.float32)
        with jax.profiler.trace(d):
            for _ in range(4):
                y = roll_chain(x, 8, 16, 1)
            np.asarray(y)
        files = glob.glob(d + "/**/*", recursive=True)
        trace_files = [f for f in files if "trace" in f or ".pb" in f]
        print(f"xprof: trace dir has {len(files)} files; "
              f"device traces: {trace_files[:4]}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"xprof: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    bench_kernel()
    bench_rolls()
    try_xprof()
