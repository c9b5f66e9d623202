"""Does Mosaic compile int8 dot_general inside a Pallas kernel, and at
what rate vs bf16?  Decides whether the u16 prefilter can run its byte
matmuls on the int8 MXU path (v5e lists 2x int8 throughput).

Shapes mirror the prefilter: filt [128, M] x oh [128, tile] -> [M, tile].
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.perf import repeat_time

M = 2048
TILE = 1024
BLOCKS = 3


def _kernel_bf16(f_ref, x_ref, o_ref):
    acc = None
    for b in range(BLOCKS):
        part = jax.lax.dot_general(
            f_ref[b * 128:(b + 1) * 128, :].astype(jnp.bfloat16),
            x_ref[b * 128:(b + 1) * 128, :].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    o_ref[:] = jnp.max(acc, axis=0, keepdims=True).astype(jnp.int32)


def _kernel_int8(f_ref, x_ref, o_ref):
    acc = None
    for b in range(BLOCKS):
        part = jax.lax.dot_general(
            f_ref[b * 128:(b + 1) * 128, :],
            x_ref[b * 128:(b + 1) * 128, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = part if acc is None else acc + part
    o_ref[:] = jnp.max(acc, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("which",))
def run(f, x, which: str, carry):
    x = x + carry.astype(x.dtype)
    kern = _kernel_bf16 if which == "bf16" else _kernel_int8
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, TILE), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=160 * 1024 * 1024),
    )(f, x)


def main():
    rng = np.random.default_rng(0)
    fb = rng.integers(-100, 100, (BLOCKS * 128, M)).astype(np.float32)
    xb = rng.integers(0, 2, (BLOCKS * 128, TILE)).astype(np.float32)
    fi = fb.astype(np.int8)
    xi = xb.astype(np.int8)
    for which, f, x in (("bf16", fb, xb), ("int8", fi, xi)):
        try:
            fn = lambda f_, x_, c: run(f_, x_, which, c)
            out = jax.jit(fn)(f, x, np.int32(0))
            out.block_until_ready()
            np.asarray(out)
            def make():
                return (lambda f_, x_, c: run(f_, x_, which, c)), (f, x), 0
            per, spans = repeat_time(make, r_lo=64, r_hi=256, trials=3)
            flops = 2 * BLOCKS * 128 * M * TILE
            print(f"{which}: {per*1e6:.1f} us/call -> "
                  f"{flops/per/1e12:.1f} Tops  spans={spans}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{which}: FAILED {type(e).__name__}: {str(e)[:500]}",
                  flush=True)


if __name__ == "__main__":
    main()
