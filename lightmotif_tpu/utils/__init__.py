"""Utilities: profiling/throughput observability."""

from .profiling import ScanStats, profile_trace, throughput

__all__ = ["ScanStats", "profile_trace", "throughput"]
