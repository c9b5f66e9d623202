"""Throughput (not latency) of cross-lane ops: P=4 independent chains
per op class, so issue rate rather than dependency latency binds."""
import functools
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.perf import repeat_time

CHUNKS, BL = 8, 65536
GRID = 9
LP = CHUNKS * BL * GRID
N_POS = LP
P = 4  # independent chains

def make_kernel(mode, r):
    def kern(b0_ref, out_ref):
        x = b0_ref[:].astype(jnp.int32)
        if mode == "roll":
            accs = [x + i for i in range(P)]
            for i in range(r):
                accs = [pltpu.roll(a, BL - 1 - (i % 3), axis=1)
                        for a in accs]
            acc = accs[0]
            for a in accs[1:]:
                acc = acc + a
            out_ref[:] = acc.astype(jnp.float32)
        elif mode == "gather":
            sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNKS, 1), 0)
            col = jnp.broadcast_to(sub.astype(jnp.float32), (CHUNKS, BL))
            idxs = [(x + i) & 7 for i in range(P)]
            acc = jnp.zeros((CHUNKS, BL), jnp.float32)
            for i in range(r):
                for p in range(P):
                    acc = acc + jnp.take_along_axis(col, idxs[p], axis=0)
                idxs = [(ix + 1) & 7 for ix in idxs]
            out_ref[:] = acc
        elif mode == "kernelmix":
            # the real kernel's mix per j-step: one gather + one roll,
            # chained into one serial add accumulator (m-1 steps)
            sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNKS, 1), 0)
            col = jnp.broadcast_to(sub.astype(jnp.float32), (CHUNKS, BL))
            idx = x & 7
            acc = jnp.take_along_axis(col, idx, axis=0)
            for i in range(r):
                v = jnp.take_along_axis(col, (idx + i) & 7, axis=0)
                acc = acc + pltpu.roll(v, BL - i - 1, axis=1)
            out_ref[:] = acc
    return kern

def bench(mode, r, ops_per_iter):
    kern = make_kernel(mode, r)
    seq = jax.device_put(np.random.default_rng(0).integers(
        0, 5, size=LP, dtype=np.int8))

    @jax.jit
    def run(s, carry):
        view = (s + carry.astype(jnp.int8)).reshape(CHUNKS, BL * GRID)
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((CHUNKS, BL), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CHUNKS, BL), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((CHUNKS, BL * GRID),
                                           jnp.float32),
        )(view)

    per, spans = repeat_time(lambda: (lambda s, c: run(s, c), (seq,), 777),
                             r_lo=64, r_hi=1024, trials=3)
    rate = N_POS / per
    cyc = 940e6 / (rate / 1024)
    n_ops = r * ops_per_iter
    print(f"{mode:10s} r={r:3d} ops={n_ops:3d}  {rate/1e9:7.2f} Gpos/s  "
          f"{cyc:7.2f} cyc/vreg  {cyc/n_ops:6.3f} cyc/op", flush=True)

bench("roll", 14, P)      # 56 independent rolls
bench("roll", 7, P)       # 28
bench("gather", 14, P)    # 56 independent gathers
bench("gather", 7, P)
bench("kernelmix", 14, 2) # 14 gathers + 14 rolls (the m=15 shape)
bench("kernelmix", 28, 2)
