"""Per-op vreg costs of the gather kernel's three op classes.

Measures pure chains of (a) lane rolls, (b) sublane gathers, (c) f32
adds on the exact kernel geometry ([8, 65536] blocks over the padded
genome), so DESIGN.md can derive the f32 ceiling as op-count x
measured per-op issue rate instead of a variant sweep (VERDICT round-2
task 4).  Chains carry a data dependency so nothing can be elided or
reassociated.
"""
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
GRID = 9  # ~ E. coli size: 9 * 8 * 65536 = 4.7M positions
LP = CHUNKS * BL * GRID
N_POS = LP
R = 14  # chain length == the m=15 kernel's roll/add count

def make_kernel(mode, r):
    def kern(b0_ref, out_ref):
        x = b0_ref[:].astype(jnp.int32)
        if mode == "roll":
            acc = x
            for i in range(r):
                acc = pltpu.roll(acc, BL - 1 - (i % 3), axis=1)
            out_ref[:] = acc.astype(jnp.float32)
        elif mode == "add":
            acc = x.astype(jnp.float32)
            b = acc * 0.5
            for i in range(r):
                acc = acc + b  # serial dependence
            out_ref[:] = acc
        elif mode == "gather":
            sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNKS, 1), 0)
            col = jnp.broadcast_to(sub.astype(jnp.float32), (CHUNKS, BL))
            idx = x & 7
            acc = jnp.zeros((CHUNKS, BL), jnp.float32)
            for i in range(r):
                v = jnp.take_along_axis(col, idx, axis=0)
                acc = acc + v          # keep each gather live
                idx = (idx + 1) & 7    # serial dependence between gathers
            out_ref[:] = acc
        elif mode == "io":
            out_ref[:] = x.astype(jnp.float32)
    return kern

def bench(mode, r):
    kern = make_kernel(mode, r)
    seq = jax.device_put(np.random.default_rng(0).integers(
        0, 5, size=LP, dtype=np.int8))

    @functools.partial(jax.jit, static_argnames=())
    def run(s, carry):
        view = (s + carry.astype(jnp.int8)).reshape(CHUNKS, BL * GRID)
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((CHUNKS, BL), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CHUNKS, BL), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((CHUNKS, BL * GRID), jnp.float32),
        )(view)

    per, spans = repeat_time(lambda: (lambda s, c: run(s, c), (seq,), 12345),
                             r_lo=64, r_hi=2048, trials=3)
    rate = N_POS / per
    # cycles per vreg of 1024 positions at the v5e 940 MHz clock
    cyc = 940e6 / (rate / 1024)
    print(f"{mode:8s} r={r:3d}  {rate/1e9:7.2f} Gpos/s  "
          f"{cyc:7.2f} cyc/vreg  {cyc/max(r,1):6.3f} cyc/op", flush=True)
    return rate, cyc

for mode in ("io", "add", "roll", "gather"):
    for r in (14, 28):
        bench(mode, r)
