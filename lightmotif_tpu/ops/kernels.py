"""Pallas TPU kernels for the hot scoring loops.

Placeholder round-1 scaffolding: delegates to the XLA implementations
until the hand-tiled kernels land.  The public contract (bit-parity with
:mod:`lightmotif_tpu.ops.xla_ops`) is enforced by the backend-parity
tests either way.
"""

from __future__ import annotations

from . import xla_ops


def score_f32(seq, pssm, n_scores: int):
    return xla_ops.score_f32(seq, pssm, n_scores)


def score_u8(seq, dm, n_scores: int):
    return xla_ops.score_u8(seq, dm, n_scores)
