"""Device compute layer (XLA programs and Pallas TPU kernels)."""

from .pipeline import Pipeline, default_pipeline, score

__all__ = ["Pipeline", "default_pipeline", "score"]
