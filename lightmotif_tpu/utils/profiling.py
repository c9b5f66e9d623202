"""Profiling and throughput observability.

The reference has no tracing beyond ``cargo bench`` MB/s counters
(``lightmotif-bench/dna.rs:48-49``); here the equivalents are:

* :func:`profile_trace` -- context manager wrapping ``jax.profiler``
  trace collection (view with TensorBoard / xprof);
* :func:`throughput` -- positions/s measurement of a callable using the
  tunnel-safe protocol from :mod:`tools.perf` when available, plain
  wall-clock otherwise;
* :class:`ScanStats` -- counters a scanning loop can update to report
  positions and bytes processed per second (the MB/s metric the
  reference benches print).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Collect a device profile for the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput(fn, *args, positions: int, reps: int = 5) -> dict:
    """Wall-clock positions/s of ``fn(*args)`` (device work must be
    synchronized by ``fn`` itself)."""
    import jax

    jax.block_until_ready(fn(*args))  # warmup/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return {
        "seconds": best,
        "positions": positions,
        "positions_per_second": positions / best,
        "mb_per_second": positions / best / 1e6,  # 1 byte/position
    }


@dataclass
class ScanStats:
    """Counters for a scanning loop (positions == bytes for DNA)."""

    positions: int = 0
    hits: int = 0
    sequences: int = 0
    started: float = field(default_factory=time.perf_counter)

    def update(self, positions: int = 0, hits: int = 0, sequences: int = 0):
        self.positions += positions
        self.hits += hits
        self.sequences += sequences

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.started

    @property
    def positions_per_second(self) -> float:
        return self.positions / self.elapsed if self.elapsed else 0.0

    def summary(self) -> str:
        return (
            f"{self.sequences} sequences, {self.positions} positions, "
            f"{self.hits} hits in {self.elapsed:.2f}s "
            f"({self.positions_per_second / 1e6:.1f} Mpos/s)"
        )
