"""Reliable device timing through the remote-TPU tunnel.

The axon platform's ``block_until_ready`` does not actually synchronize
with device execution, per-call host sync costs a ~25 ms round trip,
and identical re-dispatches can be served from a cache.  The only
trustworthy protocol found:

* wrap the op in an in-jit ``lax.fori_loop`` whose carry perturbs the
  operands by ``carry * 1e-45`` (flushes to zero on TPU at runtime, but
  the compiler cannot fold it, so iterations can be neither elided nor
  hoisted);
* force completion with a scalar ``jax.device_get``;
* time two repetition counts and report the slope, cancelling the fixed
  round-trip + dispatch overhead.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-45  # flushes to 0 in TPU f32 arithmetic; opaque to the compiler


def repeat_time(make_op, r_lo: int = 2, r_hi: int = 10, trials: int = 5):
    """Per-iteration device seconds of ``op = make_op()``.

    ``make_op`` returns ``(fn, args, probe)`` where ``fn(*args, carry)``
    -> array, and ``probe`` is an index into the flat output used to
    derive the next carry.
    """

    fn, args, probe = make_op()

    def looped(r):
        def body(_, carry):
            out = fn(*args, carry)
            val = out.reshape(-1)[probe].astype(jnp.float32)
            return carry + val * jnp.float32(EPS)

        return jax.jit(
            lambda: jax.lax.fori_loop(0, r, body, jnp.float32(0.0))
        )

    results = {}
    for r in (r_lo, r_hi):
        f = looped(r)
        float(jax.device_get(f()))  # compile + first run
        best = np.inf
        for _ in range(trials):
            t0 = time.perf_counter()
            float(jax.device_get(f()))
            best = min(best, time.perf_counter() - t0)
        results[r] = best
    per_iter = (results[r_hi] - results[r_lo]) / (r_hi - r_lo)
    # The slope is only trustworthy when the rep-span delta dwarfs the
    # tunnel's ~30 ms round-trip jitter.  Spans of 5-8 ms produced
    # phantom 3-5x "speedups" TWICE (round-1 adds-only "70 Gpos/s",
    # round-2 interim gather "102 Gpos/s" -- both collapse to ~30-32 at
    # >=150 ms spans); treat anything under ~100 ms as suspect.
    if results[r_hi] - results[r_lo] < 0.1:
        import warnings

        warnings.warn(
            f"repeat_time span too small ({results[r_hi] - results[r_lo]:.4f}s"
            f" between r={r_lo} and r={r_hi}); increase r_hi -- spans under"
            " ~100 ms have produced 3x-inflated readings on this tunnel",
            stacklevel=2,
        )
    return per_iter, results
