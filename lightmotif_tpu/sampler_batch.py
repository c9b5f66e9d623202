"""Batched motif discovery: many independent Gibbs chains on device.

The reference sampler (``lightmotif/src/sampler.rs``) runs one chain;
restarts (the standard remedy for Gibbs samplers stuck in local optima)
multiply its wall time.  On TPU the chains are embarrassingly parallel:
this module runs ``chains`` independent samplers (OOPS or ZOOPS)
inside a single ``lax.scan``, vectorized over the chain axis, with the
deterministic threefry PRNG.  One device program performs every restart
at once; the host then ranks chains by information content and returns
the best.

Each step mirrors the host sampler exactly (``sampler.py``): pick a
hold-out sequence, rebuild counts/background from the rest, form the
0.1-pseudocount log2-odds PSSM, score the hold-out at every valid
start, and resample its start with weights ``2^(score/T)``.  ZOOPS
chains additionally carry an active-set mask, seed-biased hold-outs
during inertia, IC-gated inclusion, and patience-based convergence
(frozen chains keep their state for the rest of the scan).

The step math lives in module-level pure functions (``counts_of`` /
``pssm_of`` / ``score_holdouts``) shared by the jitted scan and the
step-parity tests, and the scan carry is an explicit
:class:`BatchSamplerState` PyTree: every ``sample_*_batch`` call
returns ``result.state``, and passing ``state=`` resumes the chains
exactly where they stopped (SURVEY §5 checkpoint/resume).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

from .alphabet import DNA
from .matrix import CountMatrix
from .sequence import EncodedSequence

__all__ = [
    "sample_oops_batch",
    "sample_zoops_batch",
    "BatchSamplerResult",
    "BatchSamplerState",
]


class BatchSamplerState(NamedTuple):
    """Explicit scan carry of the batched sampler (a JAX PyTree).

    Checkpointable with ``jax.device_get`` / any PyTree serializer and
    resumable via ``sample_*_batch(..., state=...)``.
    """

    starts: object     # int32 [C, N] current motif start per sequence
    active: object     # bool  [C, N] active set (all True for OOPS)
    seed_mask: object  # bool  [C, N] ZOOPS seed subset (static per run)
    last_inc: object   # int32 [C]    step of the last ZOOPS inclusion
    converged: object  # bool  [C]    patience-frozen chains
    key: object        # PRNG key for the next step
    step: object       # int32 []     global step counter


def counts_of(seqs, totals, starts, active_f, width: int, k: int):
    """Motif counts ``[C, w, K]`` + background counts ``[C, K]`` from
    per-chain starts and an active-set weighting (the batched analogue
    of ``Sampler._add_counts``, ``sampler.rs:472-510``)."""
    import jax.numpy as jnp

    n = seqs.shape[0]
    n_iota = jnp.arange(n)
    idx = starts[:, :, None] + jnp.arange(width)[None, None, :]
    sym = seqs[n_iota[None, :, None], idx]  # [C, N, w]
    oh = (sym[..., None] ==
          jnp.arange(k)[None, None, None, :]).astype(jnp.float32)
    oh = oh * active_f[:, :, None, None]
    counts = oh.sum(axis=1)  # [C, w, K]
    bgc = (totals[None, :, :] * active_f[:, :, None]).sum(axis=1) \
        - counts.sum(axis=1)  # [C, K]
    return counts, bgc


def pssm_of(counts, bgc, k: int):
    """0.1-pseudocount log2-odds PSSM ``[C, w, K]`` + information
    content ``[C]`` (the batched ``Sampler._prepare_pssm``).

    Wildcards get zero pseudocount; a zero-background symbol maps to
    ``-inf`` like ``FrequencyMatrix.to_scoring`` and contributes 0 to
    the information content (the reference skips non-finite terms)."""
    import jax.numpy as jnp

    pseudo = jnp.where(jnp.arange(k) == k - 1, 0.0, 0.1).astype(jnp.float32)
    bg = bgc / jnp.maximum(bgc.sum(-1, keepdims=True), 1.0)
    fr = counts + pseudo[None, None, :]
    fr = fr / fr.sum(-1, keepdims=True)
    pssm = jnp.where(
        bg[:, None, :] > 0,
        jnp.log2(fr / jnp.maximum(bg[:, None, :], 1e-30)),
        -jnp.inf,
    )  # [C, w, K]
    ic = jnp.sum(jnp.where(jnp.isfinite(pssm), fr * pssm, 0.0),
                 axis=(1, 2))
    return pssm, ic


def score_holdouts(seqz, pssm, valid_z, width: int, k: int):
    """Exact f32 scores of every window start of each chain's hold-out
    sequence (ascending-j select-chain adds, bit-identical to
    ``ScoringMatrix.score_host``); invalid starts get ``-inf``."""
    import jax.numpy as jnp

    chains, lp = seqz.shape
    lv = lp - width + 1
    acc = jnp.zeros((chains, lv), jnp.float32)
    for j in range(width):
        sym_j = seqz[:, j:j + lv].astype(jnp.int32)
        val = jnp.broadcast_to(pssm[:, j, k - 1:k], (chains, lv))
        for s in range(k - 2, -1, -1):
            val = jnp.where(sym_j == s, pssm[:, j, s:s + 1], val)
        acc = acc + val
    p_iota = jnp.arange(lv)[None, :]
    return jnp.where(p_iota < valid_z[:, None], acc, -jnp.inf)


class BatchSamplerResult:
    """Final state of every chain plus the information-content ranking."""

    __slots__ = ("starts", "counts", "information_content", "best",
                 "alphabet", "active", "state")

    def __init__(self, starts, counts, information_content, best, alphabet):
        self.starts = starts
        self.counts = counts
        self.information_content = information_content
        self.best = best
        self.alphabet = alphabet
        self.active = None
        self.state = None

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
    static_argnames=("width", "chains", "k", "zoops", "seeds"),
)
def _init_chains(seqs, valid, key, width: int, chains: int, k: int,
                 zoops: bool, seeds: int):
    import jax
    import jax.numpy as jnp

    n = seqs.shape[0]
    key, k0, k1 = jax.random.split(key, 3)
    u = jax.random.uniform(k0, (chains, n))
    starts0 = (u * valid[None, :].astype(jnp.float32)).astype(jnp.int32)

    if zoops:
        # random seed subset per chain (sampler.rs:397-410)
        order = jax.random.uniform(k1, (chains, n)).argsort(axis=-1)
        rank = order.argsort(axis=-1)
        seed_mask = rank < max(seeds, 1)
        active0 = seed_mask
    else:
        seed_mask = jnp.ones((chains, n), jnp.bool_)
        active0 = jnp.ones((chains, n), jnp.bool_)

    return BatchSamplerState(
        starts0, active0, seed_mask,
        jnp.zeros(chains, jnp.int32), jnp.zeros(chains, jnp.bool_),
        key, jnp.int32(0),
    )


@functools.partial(
    __import__("jax").jit,
    static_argnames=("width", "steps", "chains", "k", "temperature",
                     "zoops", "inertia", "patience"),
)
def _run_chains(seqs, valid, totals, state: BatchSamplerState, width: int,
                steps: int, chains: int, k: int, temperature: float,
                zoops: bool = False, inertia: int = 0, patience: int = 0):
    import jax
    import jax.numpy as jnp

    n, lp = seqs.shape
    c_iota = jnp.arange(chains)
    n_iota = jnp.arange(n)
    ln2 = np.float32(np.log(2.0))
    seed_mask = state.seed_mask

    def step(carry, step_i):
        starts, active, last_inc, converged, key = carry
        key, kz, kz2, ks = jax.random.split(key, 4)

        if zoops:
            # seed-biased hold-out during inertia (sampler.rs:460-470);
            # the seed-biased and uniform draws use distinct subkeys so
            # the two streams stay uncorrelated across the inertia edge
            zl = jnp.where(seed_mask, 0.0, -jnp.inf)
            z_seed = jax.random.categorical(kz, zl, axis=-1)
            z_any = jax.random.randint(kz2, (chains,), 0, n)
            z = jnp.where(step_i < inertia, z_seed, z_any)
        else:
            z = jax.random.randint(kz, (chains,), 0, n)

        was_active = active[c_iota, z]
        holdout = (n_iota[None, :] == z[:, None])
        act_f = (active & ~holdout).astype(jnp.float32)
        counts, bgc = counts_of(seqs, totals, starts, act_f, width, k)
        pssm, ic_without = pssm_of(counts, bgc, k)

        logits = score_holdouts(seqs[z], pssm, valid[z], width, k) \
            * (ln2 / np.float32(temperature))
        new = jax.random.categorical(ks, logits, axis=-1).astype(jnp.int32)
        # all--inf weights: keep the previous start, like the host
        # sampler (reference WeightedIndex::new Err, sampler.rs:528-538)
        degenerate = ~jnp.isfinite(jnp.max(logits, axis=-1))
        prev = starts[c_iota, z]
        new = jnp.where(degenerate | converged, prev, new)
        starts = starts.at[c_iota, z].set(new)

        if zoops:
            # accept a newly-included sequence only if the information
            # content improves (sampler.rs:550-595)
            act_with = active.at[c_iota, z].set(True).astype(jnp.float32)
            counts2, bgc2 = counts_of(seqs, totals, starts, act_with,
                                      width, k)
            _, ic_with = pssm_of(counts2, bgc2, k)
            accept = was_active | (ic_with >= ic_without)
            accept = accept & ~converged
            new_active = active.at[c_iota, z].set(
                jnp.where(converged, was_active, accept))
            inc_now = (~was_active) & accept
            last_inc = jnp.where(inc_now, step_i, last_inc)
            # convergence is only evaluated when an inactive sequence
            # was held out, like the host sampler (sampler.rs:586-593)
            converged = converged | (
                (~was_active) & (step_i - last_inc > patience))
            active = new_active
        return (starts, active, last_inc, converged, key), None

    carry0 = (state.starts, state.active, state.last_inc, state.converged,
              state.key)
    (starts, active, last_inc, converged, key), _ = jax.lax.scan(
        step, carry0, state.step + jnp.arange(steps))
    out_state = BatchSamplerState(
        starts, active, seed_mask, last_inc, converged, key,
        state.step + steps)

    # final counts over the active set + per-chain information content
    counts, bgc = counts_of(seqs, totals, starts,
                            active.astype(jnp.float32), width, k)
    pseudo = jnp.where(jnp.arange(k) == k - 1, 0.0, 0.1).astype(jnp.float32)
    fr = counts + pseudo[None, None, :]
    fr = fr / fr.sum(-1, keepdims=True)
    bg = bgc / jnp.maximum(bgc.sum(-1, keepdims=True), 1.0)
    term = jnp.where(
        (fr > 0) & (bg[:, None, :] > 0),
        fr * jnp.log2(fr / jnp.maximum(bg[:, None, :], 1e-30)),
        0.0,
    )
    ic = term.sum(axis=(1, 2))
    return out_state, counts, ic


def _sample_batch(sequences, width, steps, chains, seed, temperature,
                  alphabet, zoops, seeds, inertia, patience, state=None):
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

    seqs_d = jnp.asarray(mat)
    valid_d = jnp.asarray(valid)
    if state is None:
        state = _init_chains(seqs_d, valid_d, jax.random.PRNGKey(seed),
                             width, chains, k, zoops, seeds)
    out_state, counts, ic = _run_chains(
        seqs_d,
        valid_d,
        jnp.asarray(totals),
        state,
        width,
        steps,
        chains,
        k,
        float(temperature),
        zoops,
        inertia,
        patience,
    )
    starts = np.asarray(jax.device_get(out_state.starts))
    counts = np.asarray(jax.device_get(counts))
    ic = np.asarray(jax.device_get(ic))
    best = int(np.argmax(ic))
    res = BatchSamplerResult(starts, counts, ic, best, alphabet)
    res.active = np.asarray(jax.device_get(out_state.active))
    res.state = out_state
    return res


def sample_oops_batch(
    sequences,
    width: int = 10,
    steps: int = 100,
    chains: int = 64,
    seed: int = 0,
    temperature: float = 1.0,
    alphabet=DNA,
    state: BatchSamplerState | None = None,
) -> BatchSamplerResult:
    """Run ``chains`` independent OOPS Gibbs chains in one device scan.

    Returns a :class:`BatchSamplerResult`; ``result.best`` is the chain
    with the highest information content, ``result.pssm()`` its motif,
    ``result.state`` the resumable carry: passing it back as ``state=``
    continues the same chains for ``steps`` more steps, bit-identically
    to one longer run.  Deterministic for a given ``seed`` (threefry).
    """
    return _sample_batch(sequences, width, steps, chains, seed,
                         temperature, alphabet, False, 0, 0, 0,
                         state=state)


def sample_zoops_batch(
    sequences,
    width: int = 10,
    steps: int = 100,
    chains: int = 64,
    seed: int = 0,
    temperature: float = 1.0,
    seeds: int = 2,
    inertia: int | None = None,
    patience: int | None = None,
    alphabet=DNA,
    state: BatchSamplerState | None = None,
) -> BatchSamplerResult:
    """Batched ZOOPS chains (zero-or-one occurrence per sequence).

    Mirrors the host sampler's zoops rules per chain: a random seed
    subset starts active, hold-outs are seed-biased for ``inertia``
    steps, a newly-included sequence is kept only if the information
    content improves, and a chain freezes after ``patience`` steps
    without an inclusion.  ``result.active`` marks each chain's final
    active set; ``result.state`` resumes (step counting, inertia and
    patience windows continue across the boundary).
    """
    n = len(list(sequences)) if not hasattr(sequences, "__len__") else len(sequences)
    if inertia is None:
        inertia = seeds * 50 if seeds else 0
    if patience is None:
        patience = n
    return _sample_batch(sequences, width, steps, chains, seed,
                         temperature, alphabet, True, seeds, int(inertia),
                         int(patience), state=state)
