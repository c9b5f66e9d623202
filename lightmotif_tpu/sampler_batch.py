"""Batched motif discovery: many independent Gibbs chains on device.

The reference sampler (``lightmotif/src/sampler.rs``) runs one chain;
restarts (the standard remedy for Gibbs samplers stuck in local optima)
multiply its wall time.  On TPU the chains are embarrassingly parallel:
this module runs ``chains`` independent OOPS samplers inside a single
``lax.scan``, vectorized over the chain axis, with the deterministic
threefry PRNG.  One device program performs every restart at once; the
host then ranks chains by information content and returns the best.

Each step mirrors the host sampler exactly (``sampler.py``): pick a
hold-out sequence, rebuild counts/background from the rest, form the
0.1-pseudocount log2-odds PSSM, score the hold-out at every valid
start, and resample its start with weights ``2^(score/T)``.

ZOOPS (data-dependent active sets) stays on the host sampler.
"""

from __future__ import annotations

import functools

import numpy as np

from .alphabet import DNA
from .matrix import CountMatrix
from .sequence import EncodedSequence

__all__ = ["sample_oops_batch", "BatchSamplerResult"]


class BatchSamplerResult:
    """Final state of every chain plus the information-content ranking."""

    __slots__ = ("starts", "counts", "information_content", "best", "alphabet")

    def __init__(self, starts, counts, information_content, best, alphabet):
        self.starts = starts
        self.counts = counts
        self.information_content = information_content
        self.best = best
        self.alphabet = alphabet

    def count_matrix(self, chain: int | None = None) -> CountMatrix:
        c = self.best if chain is None else chain
        return CountMatrix(
            self.alphabet,
            self.counts[c].astype(np.uint32),
            int(self.starts.shape[1]),
        )

    def pssm(self, chain: int | None = None):
        return self.count_matrix(chain).to_freq(0.1).to_scoring(None)


@functools.partial(
    __import__("jax").jit,
    static_argnames=("width", "steps", "chains", "k", "temperature"),
)
def _run_chains(seqs, valid, totals, key, width: int, steps: int,
                chains: int, k: int, temperature: float):
    import jax
    import jax.numpy as jnp

    n, lp = seqs.shape
    lv = lp - width + 1
    c_iota = jnp.arange(chains)
    n_iota = jnp.arange(n)
    ln2 = np.float32(np.log(2.0))

    key, k0 = jax.random.split(key)
    u = jax.random.uniform(k0, (chains, n))
    starts0 = (u * valid[None, :].astype(jnp.float32)).astype(jnp.int32)

    pseudo = jnp.where(jnp.arange(k) == k - 1, 0.0, 0.1).astype(jnp.float32)

    def counts_of(starts, active):
        idx = starts[:, :, None] + jnp.arange(width)[None, None, :]
        sym = seqs[n_iota[None, :, None], idx]  # [C, N, w]
        oh = (sym[..., None] ==
              jnp.arange(k)[None, None, None, :]).astype(jnp.float32)
        oh = oh * active[:, :, None, None]
        counts = oh.sum(axis=1)  # [C, w, K]
        bgc = (totals[None, :, :] * active[:, :, None]).sum(axis=1) \
            - counts.sum(axis=1)  # [C, K]
        return counts, bgc

    def step(carry, _):
        starts, key = carry
        key, kz, ks = jax.random.split(key, 3)
        z = jax.random.randint(kz, (chains,), 0, n)
        active = (n_iota[None, :] != z[:, None]).astype(jnp.float32)
        counts, bgc = counts_of(starts, active)

        bg = bgc / jnp.maximum(bgc.sum(-1, keepdims=True), 1.0)
        fr = (counts + pseudo[None, None, :])
        fr = fr / fr.sum(-1, keepdims=True)
        pssm = jnp.where(
            bg[:, None, :] > 0,
            jnp.log2(fr / jnp.maximum(bg[:, None, :], 1e-30)),
            -jnp.inf,
        )  # [C, w, K]

        seqz = seqs[z]  # [C, Lp]
        acc = jnp.zeros((chains, lv), jnp.float32)
        for j in range(width):
            sym_j = seqz[:, j:j + lv].astype(jnp.int32)
            val = jnp.broadcast_to(pssm[:, j, k - 1:k], (chains, lv))
            for s in range(k - 2, -1, -1):
                val = jnp.where(sym_j == s, pssm[:, j, s:s + 1], val)
            acc = acc + val

        logits = acc * (ln2 / np.float32(temperature))
        p_iota = jnp.arange(lv)[None, :]
        logits = jnp.where(p_iota < valid[z][:, None], logits, -jnp.inf)
        new = jax.random.categorical(ks, logits, axis=-1).astype(jnp.int32)
        # all--inf weights: keep the previous start, like the host
        # sampler (reference WeightedIndex::new Err, sampler.rs:528-538)
        degenerate = ~jnp.isfinite(jnp.max(logits, axis=-1))
        prev = starts[c_iota, z]
        new = jnp.where(degenerate, prev, new)
        starts = starts.at[c_iota, z].set(new)
        return (starts, key), None

    (starts, key), _ = jax.lax.scan(
        step, (starts0, key), None, length=steps)

    # final counts over ALL sequences + per-chain information content
    counts, bgc = counts_of(starts, jnp.ones((chains, n), jnp.float32))
    fr = counts + pseudo[None, None, :]
    fr = fr / fr.sum(-1, keepdims=True)
    bg = bgc / jnp.maximum(bgc.sum(-1, keepdims=True), 1.0)
    term = jnp.where(
        (fr > 0) & (bg[:, None, :] > 0),
        fr * jnp.log2(fr / jnp.maximum(bg[:, None, :], 1e-30)),
        0.0,
    )
    ic = term.sum(axis=(1, 2))
    return starts, counts, ic


def sample_oops_batch(
    sequences,
    width: int = 10,
    steps: int = 100,
    chains: int = 64,
    seed: int = 0,
    temperature: float = 1.0,
    alphabet=DNA,
) -> BatchSamplerResult:
    """Run ``chains`` independent OOPS Gibbs chains in one device scan.

    Returns a :class:`BatchSamplerResult`; ``result.best`` is the chain
    with the highest information content, ``result.pssm()`` its motif.
    Deterministic for a given ``seed`` (threefry PRNG).
    """
    import jax
    import jax.numpy as jnp

    seqs = [
        s if isinstance(s, EncodedSequence)
        else EncodedSequence.encode(s, alphabet)
        for s in sequences
    ]
    if any(len(s) < width for s in seqs):
        raise ValueError("sequence shorter than motif width")
    k = alphabet.size
    n = len(seqs)
    lp = max(len(s) for s in seqs)
    mat = np.full((n, lp), alphabet.default_index, np.uint8)
    totals = np.zeros((n, k), np.float32)
    valid = np.zeros(n, np.int32)
    for i, s in enumerate(seqs):
        mat[i, : len(s)] = s.data
        totals[i] = np.bincount(s.data, minlength=k).astype(np.float32)
        valid[i] = len(s) - width + 1

    starts, counts, ic = _run_chains(
        jnp.asarray(mat),
        jnp.asarray(valid),
        jnp.asarray(totals),
        jax.random.PRNGKey(seed),
        width,
        steps,
        chains,
        k,
        float(temperature),
    )
    starts = np.asarray(jax.device_get(starts))
    counts = np.asarray(jax.device_get(counts))
    ic = np.asarray(jax.device_get(ic))
    best = int(np.argmax(ic))
    return BatchSamplerResult(starts, counts, ic, best, alphabet)
