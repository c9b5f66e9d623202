"""The compute pipeline: host objects in, device results out.

This is the TPU analogue of the reference's ``Pipeline`` + runtime
dispatch (``lightmotif/src/pli/mod.rs``, ``pli/dispatch.rs``).  Instead
of CPU-feature dispatch it selects between device backends:

* ``"xla"``   -- pure jnp programs (:mod:`lightmotif_tpu.ops.xla_ops`);
* ``"pallas"``-- hand-written Pallas TPU kernels for the hot loops
  (:mod:`lightmotif_tpu.ops.kernels`), falling back to XLA off-TPU.

Compiled executables are cached per (motif length, alphabet size,
padded sequence length) so repeated scans hit the jit cache.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..scores import Scores, StripedScores
from ..sequence import EncodedSequence, StripedSequence
from . import xla_ops

__all__ = ["Pipeline", "default_pipeline", "score"]


def _platform() -> str:
    return jax.devices()[0].platform


#: Host->device transfer packing: ``None`` packs two 4-bit ranks per
#: byte on TPU for alphabets with K <= 16 (halves the bytes crossing a
#: tunneled link; measured ~2x faster flight binds); ``True``/``False``
#: force it on/off (tests exercise the packed path on CPU with True).
PACK_TRANSFER: bool | None = None


@jax.jit
def _unpack4(packed):
    """[Lp/2] u8 (two 4-bit ranks per byte) -> [Lp] int8."""
    lo = (packed & 15).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    return jnp.stack([lo, hi], axis=1).reshape(-1)


@jax.jit
def _unpack2(packed):
    """[Lp/4] u8 (four 2-bit ranks per byte) -> [Lp] int8."""
    parts = jnp.stack(
        [packed & 3, (packed >> 2) & 3, (packed >> 4) & 3, packed >> 6],
        axis=1)
    return parts.reshape(-1).astype(jnp.int8)


@jax.jit
def _unpack2_exc(packed, exc_idx, exc_val):
    """2-bit unpack + scatter of the exception list (ranks >= 4, i.e.
    wildcards/gap filler, whose low bits were packed as garbage)."""
    return _unpack2(packed).at[exc_idx].set(exc_val)


#: Exception budget for the 2-bit transfer path as a fraction of the
#: padded length: above ~1.5% out-of-range ranks the (idx, val) list
#: stops paying for itself and the 4-bit path takes over.
_EXC_SHIFT = 6


class DeviceSequence:
    """A padded device-resident encoded sequence.

    Padding symbols are the alphabet wildcard, so padded windows score
    like the reference's wrap rows (which are also wildcard-filled).
    """

    __slots__ = ("alphabet", "length", "data")

    def __init__(self, encoded: EncodedSequence, pad_multiple: int | None = None):
        if pad_multiple is None:
            # pad to the Pallas kernel geometry so the fast path engages
            from . import kernels

            pad_multiple = kernels.preferred_pad()
        self.alphabet = encoded.alphabet
        self.length = len(encoded)
        lp = xla_ops.pad_length(self.length, pad_multiple)
        host = np.full(lp, encoded.alphabet.default_index, dtype=np.int8)
        host[: self.length] = encoded.data
        pack = PACK_TRANSFER
        if pack is None:
            pack = self.alphabet.size <= 16 and _platform() in ("tpu", "axon")
        self.data = None
        if pack and self.alphabet.size <= 16 and lp % 4 == 0:
            # 2-bit fast path: ranks 0-3 pack four per byte; the rare
            # out-of-range ranks (wildcards, record-gap filler) travel
            # as an (index, value) exception list scattered on device.
            # Halves the bytes of the 4-bit path -- on a tunneled chip
            # sequence upload IS the streaming-scan steady state.
            u = host.view(np.uint8)
            exc = np.flatnonzero(u & 0xFC)
            exc_cap = lp >> _EXC_SHIFT
            if exc.size == 0 or exc.size <= exc_cap:
                v = u & 3
                b = (v[0::4] | (v[1::4] << 2) | (v[2::4] << 4)
                     | (v[3::4] << 6))
                if exc.size == 0:
                    self.data = _unpack2(jax.device_put(b))
                else:
                    # pad with index 0 writing host[0] -- always the
                    # true final value there, exception or not
                    idx = np.zeros(exc_cap, np.int32)
                    idx[: exc.size] = exc
                    val = np.full(exc_cap, host[0], np.int8)
                    val[: exc.size] = host[exc]
                    self.data = _unpack2_exc(
                        jax.device_put(b), jax.device_put(idx),
                        jax.device_put(val))
        if self.data is None and pack and self.alphabet.size <= 16 \
                and lp % 2 == 0:
            u = host.view(np.uint8)
            self.data = _unpack4(jax.device_put(u[0::2] | (u[1::2] << 4)))
        if self.data is None:
            self.data = jax.device_put(host)


def _as_device_seq(seq) -> DeviceSequence:
    if isinstance(seq, DeviceSequence):
        return seq
    if isinstance(seq, StripedSequence):
        seq = seq.unstripe()
    if isinstance(seq, EncodedSequence):
        return DeviceSequence(seq)
    raise TypeError(f"cannot score {type(seq).__name__}")


class Pipeline:
    """Scoring pipeline with backend dispatch and executable caching."""

    def __init__(self, backend: str | None = None):
        if backend is None:
            backend = os.environ.get("LIGHTMOTIF_TPU_BACKEND", "auto")
        if backend == "auto":
            backend = "pallas" if _platform() in ("tpu", "axon") else "xla"
        if backend not in ("xla", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend

    # -- jitted programs ------------------------------------------------------

    @staticmethod
    @functools.lru_cache(maxsize=64)
    def _score_fn(backend: str, n_scores: int):
        if backend == "pallas":
            from . import kernels

            def fn(seq, pssm):
                return kernels.score_f32(seq, pssm, n_scores)

        else:

            def fn(seq, pssm):
                return xla_ops.score_f32(seq, pssm, n_scores)

        return jax.jit(fn)

    @staticmethod
    @functools.lru_cache(maxsize=64)
    def _dscore_fn(backend: str, n_scores: int):
        if backend == "pallas":
            from . import kernels

            def fn(seq, dm):
                return kernels.score_u8(seq, dm, n_scores)

        else:

            def fn(seq, dm):
                return xla_ops.score_u8(seq, dm, n_scores)

        return jax.jit(fn)

    # -- public ops -----------------------------------------------------------

    def score(self, pssm, seq) -> StripedScores:
        """f32 scores of every position (reference ``Score`` trait)."""
        dseq = _as_device_seq(seq)
        m = len(pssm)
        n = max(dseq.length - m + 1, 0)
        if n == 0:
            return StripedScores(np.zeros(0, np.float32), 0)
        pssm_dev = jnp.asarray(np.asarray(pssm.data, dtype=np.float32))
        out = self._score_fn(self.backend, n)(dseq.data, pssm_dev)
        return StripedScores(np.asarray(jax.device_get(out))[:n], n)

    def score_discrete(self, dm, seq) -> StripedScores:
        """int32 over-estimating discrete scores (reference u8 path)."""
        dseq = _as_device_seq(seq)
        m = len(dm)
        n = max(dseq.length - m + 1, 0)
        if n == 0:
            return StripedScores(np.zeros(0, np.int32), 0)
        dm_dev = jnp.asarray(np.asarray(dm.data, dtype=np.uint8))
        out = self._dscore_fn(self.backend, n)(dseq.data, dm_dev)
        return StripedScores(np.asarray(jax.device_get(out))[:n], n)

    def max(self, scores: StripedScores):
        return scores.max()

    def argmax(self, scores: StripedScores):
        return scores.argmax()

    def threshold(self, scores: StripedScores, value) -> list:
        return scores.threshold(value)

    # -- fused device reductions ---------------------------------------------
    # Genome-scale max/argmax without transferring the score array to
    # the host (the reference's Maximum trait, pli/mod.rs:133-161).

    @staticmethod
    @functools.lru_cache(maxsize=64)
    def _argmax_fn(backend: str, n_scores: int):
        if backend == "pallas":
            from . import kernels as kmod

            score = kmod.score_f32
        else:
            score = xla_ops.score_f32

        def fn(seq, pssm):
            # slice off the -inf padding so an all--inf score vector
            # still argmaxes to the last VALID window (tie rule)
            scores = score(seq, pssm, n_scores)[:n_scores]
            return xla_ops.max_last(scores), xla_ops.argmax_last(scores)

        return jax.jit(fn)

    def score_max(self, pssm, seq):
        """(max score, argmax) of every window, reduced on device; the
        tie rule matches the reference (last maximum wins)."""
        dseq = _as_device_seq(seq)
        m = len(pssm)
        n = max(dseq.length - m + 1, 0)
        if n == 0:
            return None, None
        pssm_dev = jnp.asarray(np.asarray(pssm.data, dtype=np.float32))
        mx, am = self._argmax_fn(self.backend, n)(dseq.data, pssm_dev)
        return float(jax.device_get(mx)), int(jax.device_get(am))


_DEFAULT: Pipeline | None = None


def default_pipeline() -> Pipeline:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = Pipeline()
    return _DEFAULT


def score(pssm, seq) -> StripedScores:
    return default_pipeline().score(pssm, seq)
