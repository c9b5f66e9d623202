"""Multi-motif fused scanning tests."""

import jax
import numpy as np
import pytest

from lightmotif_tpu import CountMatrix, EncodedSequence
from lightmotif_tpu.scanner import MultiScanner, Scanner

from .data import PATTERNS, build_pssm


def make_motifs():
    pssm1 = build_pssm()
    cm2 = CountMatrix.from_sequences(
        [EncodedSequence.encode("ACGTACGT"), EncodedSequence.encode("ACGAACGT")]
    )
    pssm2 = cm2.to_freq(0.1).to_scoring(None)
    cm3 = CountMatrix.from_sequences(
        [EncodedSequence.encode("TTTTTTTTTTTT"), EncodedSequence.encode("TTTTTTATTTTT")]
    )
    pssm3 = cm3.to_freq(0.1).to_scoring(None)
    return [pssm1, pssm2, pssm3]


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(99)
    return EncodedSequence.encode("".join(rng.choice(list("ACGT"), size=50_000)))


def test_multi_matches_single(genome):
    motifs = make_motifs()
    thresholds = [-12.0, -4.0, -6.0]
    multi = MultiScanner(motifs, genome, thresholds).collect()
    for mid, (pssm, thr) in enumerate(zip(motifs, thresholds)):
        expected = sorted(
            (h.position, round(h.score, 4))
            for h in Scanner(pssm, genome, threshold=thr)
        )
        got = sorted(
            (h.position, round(h.score, 4)) for h in multi if h.motif == mid
        )
        assert got == expected, f"motif {mid}"


def test_multi_exact_scores(genome):
    motifs = make_motifs()
    multi = MultiScanner(motifs, genome, [-10.0, -3.0, -5.0]).collect()
    assert multi, "expected some hits"
    for h in multi[:50]:
        exact = motifs[h.motif].score_position(genome, h.position)
        assert h.score == exact  # bit-exact f32


def test_multi_scalar_threshold(genome):
    motifs = make_motifs()
    hits = MultiScanner(motifs, genome, -8.0).collect()
    assert all(h.score >= -8.0 for h in hits)


def test_multi_capacity_retry(genome):
    motifs = make_motifs()
    small = MultiScanner(motifs, genome, -12.0, capacity=8).collect()
    big = MultiScanner(motifs, genome, -12.0).collect()
    assert len(small) == len(big)


def test_multi_fused_prefilter_parity(genome):
    """Pallas fused prefilter (interpret mode) == XLA windows path."""
    from lightmotif_tpu.ops import kernels, multi_kernel

    motifs = make_motifs()
    assert multi_kernel.supports_fused(
        max(len(p) for p in motifs), 5, len(motifs)) in (True, False)
    kernels.INTERPRET = True
    jax.clear_caches()  # flag is baked into traced executables
    try:
        assert multi_kernel.supports_fused(
            max(len(p) for p in motifs), 5, len(motifs))
        fused = MultiScanner(motifs, genome, [-10.0, -3.0, -5.0]).collect()
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
    windows = MultiScanner(motifs, genome, [-10.0, -3.0, -5.0]).collect()
    a = [(h.motif, h.position, h.score) for h in fused]
    b = [(h.motif, h.position, h.score) for h in windows]
    assert a == b


def test_multi_fused_long_motifs(genome):
    """2-contraction-block fused path (motif widths 17..32)."""
    from lightmotif_tpu.ops import kernels

    import numpy as np
    from lightmotif_tpu import CountMatrix, EncodedSequence

    rng = np.random.default_rng(9)
    motifs = []
    for width in (6, 17, 25, 32):
        sites = [
            "".join("ACTG"[j] for j in rng.integers(0, 4, size=width))
            for _ in range(4)
        ]
        cm = CountMatrix.from_sequences(
            EncodedSequence.encode(s) for s in sites)
        motifs.append(cm.to_freq(0.1).to_weight(None).to_scoring())

    kernels.INTERPRET = True
    jax.clear_caches()  # flag is baked into traced executables
    try:
        fused = MultiScanner(motifs, genome, -6.0).collect()
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
    windows = MultiScanner(motifs, genome, -6.0).collect()
    assert [(h.motif, h.position, h.score) for h in fused] == [
        (h.motif, h.position, h.score) for h in windows
    ]


def test_multi_fused_very_long_motifs(genome):
    """Round-3 MAX_BLOCKS=8: DNA motifs up to 128 rows stay fused."""
    from lightmotif_tpu.ops import kernels, multi_kernel

    import numpy as np
    from lightmotif_tpu import CountMatrix, EncodedSequence

    rng = np.random.default_rng(10)
    motifs = []
    for width in (8, 70, 128):
        sites = [
            "".join("ACTG"[j] for j in rng.integers(0, 4, size=width))
            for _ in range(3)
        ]
        cm = CountMatrix.from_sequences(
            EncodedSequence.encode(s) for s in sites)
        motifs.append(cm.to_freq(0.1).to_weight(None).to_scoring())
    seq = EncodedSequence(rng.integers(0, 4, size=8000, dtype=np.uint8))

    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        assert multi_kernel.supports_fused(128, 5, 2)
        assert not multi_kernel.supports_fused(129, 5, 2)
        fused = MultiScanner(motifs, seq, -40.0).collect()
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
    windows = MultiScanner(motifs, seq, -40.0).collect()
    assert fused, "expected hits"
    assert [(h.motif, h.position, h.score) for h in fused] == [
        (h.motif, h.position, h.score) for h in windows
    ]


def test_multi_fused_protein_long(genome):
    """Round-3 MAX_BLOCKS=8: protein motifs up to 32 rows stay fused."""
    import numpy as np

    from lightmotif_tpu import PROTEIN, CountMatrix, EncodedSequence
    from lightmotif_tpu.ops import kernels, multi_kernel

    rng = np.random.default_rng(14)
    motifs = []
    for width in (10, 24, 32):
        sites = [
            "".join(PROTEIN.symbols[j]
                    for j in rng.integers(0, 20, size=width))
            for _ in range(3)
        ]
        cm = CountMatrix.from_sequences(
            EncodedSequence.encode(s, PROTEIN) for s in sites)
        motifs.append(cm.to_freq(0.1).to_weight(None).to_scoring())
    seq = EncodedSequence(
        rng.integers(0, 20, size=4000, dtype=np.uint8), PROTEIN)

    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        assert multi_kernel.supports_fused(32, 21, 2)
        assert not multi_kernel.supports_fused(33, 21, 2)
        fused = MultiScanner(motifs, seq, -60.0).collect()
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
    windows = MultiScanner(motifs, seq, -60.0).collect()
    assert fused, "expected hits"
    assert [(h.motif, h.position, h.score) for h in fused] == [
        (h.motif, h.position, h.score) for h in windows
    ]


def test_multi_fused_protein(genome):
    """Protein alphabet (K=21) uses 32-lane groups in the fused path."""
    import numpy as np

    from lightmotif_tpu import PROTEIN, CountMatrix, EncodedSequence
    from lightmotif_tpu.ops import kernels, multi_kernel

    assert multi_kernel.supports_fused(12, 21, 4) in (True, False)
    rng = np.random.default_rng(13)
    motifs = []
    for width in (6, 12, 16):
        sites = [
            "".join(PROTEIN.symbols[j]
                    for j in rng.integers(0, 20, size=width))
            for _ in range(4)
        ]
        cm = CountMatrix.from_sequences(
            EncodedSequence.encode(s, PROTEIN) for s in sites)
        motifs.append(cm.to_freq(0.1).to_weight(None).to_scoring())
    seq = EncodedSequence(
        rng.integers(0, 20, size=3000, dtype=np.uint8), PROTEIN)

    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        assert multi_kernel.supports_fused(16, 21, 3)
        fused = MultiScanner(motifs, seq, -6.0).collect()
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
    windows = MultiScanner(motifs, seq, -6.0).collect()
    assert [(h.motif, h.position, h.score) for h in fused] == [
        (h.motif, h.position, h.score) for h in windows
    ]


def test_rescore_multi_short_motif_tail():
    """A short motif's window starting past lp - m_max still rescores
    exactly (per-row clipped indexing; advisor round-1 finding)."""
    import jax.numpy as jnp

    from lightmotif_tpu.ops import multi

    motifs = make_motifs()  # lengths differ
    k = motifs[0].alphabet.size
    stack, lengths = multi.stack_motifs(
        [np.asarray(p.data, np.float32) for p in motifs], k)
    m_max = int(lengths.max())
    short = int(np.argmin(lengths))
    m_short = int(lengths[short])
    assert m_short < m_max

    rng = np.random.default_rng(7)
    seq = EncodedSequence(rng.integers(0, 4, size=64, dtype=np.uint8))
    lp = len(seq)
    # positions valid for the short motif only (past lp - m_max)
    positions = np.arange(lp - m_max + 1, lp - m_short + 1, dtype=np.int32)
    got = np.asarray(multi.rescore_multi(
        jnp.asarray(seq.data.astype(np.int8)),
        jnp.asarray(stack),
        jnp.asarray(positions),
        jnp.full(positions.shape, short, dtype=np.int32),
    ))
    expected = np.asarray(
        [motifs[short].score_position(seq, int(p)) for p in positions],
        np.float32,
    )
    assert np.array_equal(got, expected)


def test_prefilter_any_parity(genome):
    """The any-candidate prefilter (interpret mode) flags exactly the
    positions where some motif's unclamped discrete score >= its scaled
    threshold (within each motif's valid window it must agree with the
    windows-path scores; tail extras are allowed by design)."""
    import jax.numpy as jnp

    from lightmotif_tpu.ops import kernels, multi, multi_kernel

    motifs = make_motifs()
    k = motifs[0].alphabet.size
    dms = [p.to_discrete() for p in motifs]
    dm_stack, lengths = multi.stack_motifs(
        [d.data.astype(np.float32) for d in dms], k)
    m_max = int(lengths.max())
    thresholds = [-10.0, -3.0, -5.0]
    t_scaled = np.asarray(
        [d.scale(t) for d, t in zip(dms, thresholds)], np.int64)
    filters_t = multi_kernel.pack_filters_any(dm_stack, t_scaled, k)

    data = np.asarray(genome.data, np.int8)
    tile = multi_kernel.TILE
    lp = -(-data.size // tile) * tile
    flat = np.full(lp, k - 1, np.int8)
    flat[:data.size] = data

    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        maxv = np.asarray(multi_kernel.prefilter_any(
            jnp.asarray(flat), jnp.asarray(filters_t), m_max, k))
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
    got_any = maxv.reshape(-1) >= 0

    # oracle: unclamped integer scores per motif via numpy
    want_any = np.zeros(lp, bool)
    for mo, dm in enumerate(dms):
        m = len(dm)
        dv = dm.data.astype(np.int64)
        win = np.lib.stride_tricks.sliding_window_view(
            flat.astype(np.int64), m)
        raw = dv[np.arange(m)[None, :], win].sum(1)
        n_valid = data.size - m + 1
        ok = np.zeros(lp, bool)
        # pack_filters_any maps thresholds > 255 to never-pass
        if t_scaled[mo] <= 255:
            ok[: raw.size] = raw >= t_scaled[mo]
        want_any[: n_valid] |= ok[: n_valid]

    n_min = int(data.size - lengths.max() + 1)
    # within the strictest valid window the sets must agree exactly
    assert np.array_equal(got_any[:n_min], want_any[:n_min])


def test_prefilter_any16_parity(genome):
    """The u16 any-prefilter must (a) never reject a position whose
    exact f32 score passes for some motif (soundness) and (b) compute
    exactly ``max_mo(sum16 - t16)`` per position."""
    import jax.numpy as jnp

    from lightmotif_tpu.ops import kernels, multi, multi_kernel

    motifs = make_motifs()
    k = motifs[0].alphabet.size
    pssm_stack, lengths = multi.stack_motifs(
        [np.asarray(p.data, np.float32) for p in motifs], k)
    m_max = int(lengths.max())
    thresholds = np.asarray([-10.0, -3.0, -5.0], np.float64)
    d16, f16, off16 = multi.fine_discretize(pssm_stack)
    t16 = multi.fine_thresholds(thresholds, f16, off16)
    f_hi, f_lo = multi.pack_filters_fine(d16, t16, k)

    data = np.asarray(genome.data, np.int8)
    tile = multi_kernel.TILE
    lp = -(-data.size // tile) * tile
    flat = np.full(lp, k - 1, np.int8)
    flat[:data.size] = data

    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        maxv = np.asarray(multi_kernel.prefilter_any16(
            jnp.asarray(flat), jnp.asarray(f_hi), jnp.asarray(f_lo),
            m_max, k)).reshape(-1)
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()

    # oracle: per-motif u16 window sums via numpy
    want = np.full(lp, -(1 << 18), np.int64)
    f32_any = np.zeros(lp, bool)
    for mo, p in enumerate(motifs):
        m = len(p)
        dv = d16[mo, :m].astype(np.int64)
        win = np.lib.stride_tricks.sliding_window_view(
            flat.astype(np.int64), m)
        sum16 = dv[np.arange(m)[None, :], win].sum(1)
        part = sum16 - int(t16[mo])
        n_valid = data.size - m + 1
        want[: part.size] = np.maximum(want[: part.size], part)
        # exact f32 sequential window scores for the soundness check
        sc = np.asarray(p.score_host(genome))
        f32_any[: n_valid] |= sc >= np.float32(thresholds[mo])

    n_min = int(data.size - lengths.max() + 1)
    assert np.array_equal(maxv[:n_min], want[:n_min])
    # soundness: every exact-f32 pass is a u16 candidate
    assert not (f32_any[:n_min] & ~(maxv[:n_min] >= 0)).any()
    # and the u16 candidate set is actually sparser than (or equal to)
    # the exact hit union plus slack -- sanity that it's a prefilter
    assert (maxv[:n_min] >= 0).sum() >= f32_any[:n_min].sum()


def test_collect_arrays_matches_collect(genome):
    motifs = make_motifs()
    ms = MultiScanner(motifs, genome, [-10.0, -3.0, -5.0])
    mo, pos, sc = ms.collect_arrays()
    hits = MultiScanner(motifs, genome, [-10.0, -3.0, -5.0]).collect()
    assert mo.dtype == np.int32 and pos.dtype == np.int64
    assert [(h.motif, h.position, h.score) for h in hits] == \
        list(zip(mo.tolist(), pos.tolist(), sc.tolist()))


def test_multi_empty_sequence():
    """Motifs longer than the sequence: no hits, no crash."""
    short = EncodedSequence.encode("ACGT")
    motifs = make_motifs()  # all longer than 4
    assert MultiScanner(motifs, short, -5.0).collect() == []
    mo, pos, sc = MultiScanner(motifs, short, -5.0).collect_arrays()
    assert len(mo) == 0 and len(pos) == 0 and len(sc) == 0


def test_phase_c_chunked_matches_single(genome, monkeypatch):
    """The blocked sparse per-motif stage (engaged when the candidate
    capacity exceeds PHASE_C_BLOCK) produces identical hits."""
    from lightmotif_tpu.ops import multi

    motifs = make_motifs()
    ref = MultiScanner(motifs, genome, [-10.0, -3.0, -5.0]).collect()
    monkeypatch.setattr(multi, "PHASE_C_BLOCK", 64)
    jax.clear_caches()  # the block size is baked into traced programs
    try:
        # capacity 256 > 64 and divisible -> lax.map over 4 blocks
        got = MultiScanner(motifs, genome, [-10.0, -3.0, -5.0],
                           capacity=256).collect()
    finally:
        jax.clear_caches()
    assert [(h.motif, h.position, h.score) for h in got] == \
        [(h.motif, h.position, h.score) for h in ref]


def test_multiscanner_rebind_sequences(genome):
    """One packed motif set scans multiple sequences via scan(seq); hit
    sets equal per-sequence scanners."""
    motifs = make_motifs()
    ms = MultiScanner(motifs, thresholds=[-10.0, -3.0, -5.0])
    rng = np.random.default_rng(31)
    other = EncodedSequence(rng.integers(0, 4, size=30_000, dtype=np.uint8))
    for seq in (genome, other, genome):
        got = ms.scan(seq)
        want = MultiScanner(motifs, seq, [-10.0, -3.0, -5.0]).collect()
        assert [(h.motif, h.position, h.score) for h in got] == \
            [(h.motif, h.position, h.score) for h in want]
    with pytest.raises(ValueError):
        MultiScanner(motifs, thresholds=-5.0).collect()


def test_bind_alphabet_mismatch(genome):
    # ADVICE round 2: binding a protein-encoded sequence to DNA motifs
    # must raise instead of reusing the packed DNA tables as-is
    from lightmotif_tpu.alphabet import PROTEIN

    motifs = make_motifs()
    ms = MultiScanner(motifs, thresholds=-8.0)
    pseq = EncodedSequence.encode("MKVLATTR", PROTEIN)
    with pytest.raises(ValueError, match="alphabet"):
        ms.bind(pseq)


def test_bind_same_object_reuses_device_copy(genome):
    # VERDICT round-2 weak #3: same-genome rescans must not re-upload
    motifs = make_motifs()
    ms = MultiScanner(motifs, thresholds=-8.0)
    first = ms.bind(genome)._dseq
    assert ms.bind(genome)._dseq is first
    hits1 = ms.scan(genome)
    assert ms._dseq is first  # scan(seq) path caches too
    # a different object with identical content still rebinds (new copy)
    other = EncodedSequence(np.asarray(genome.data).copy())
    assert ms.bind(other)._dseq is not first
    hits2 = ms.collect()
    assert [(h.motif, h.position, h.score) for h in hits1] == \
        [(h.motif, h.position, h.score) for h in hits2]


def test_capacity_not_a_block_multiple(genome):
    # ADVICE round 2: a user capacity above PHASE_C_BLOCK that is not a
    # multiple of it must still take the memory-bounding blocked path
    from lightmotif_tpu.ops import multi

    motifs = make_motifs()
    want = [(h.motif, h.position, h.score)
            for h in MultiScanner(motifs, genome, -12.0).collect()]
    odd_cap = multi.PHASE_C_BLOCK + 1000
    got = [(h.motif, h.position, h.score)
           for h in MultiScanner(motifs, genome, -12.0,
                                 capacity=odd_cap).collect()]
    assert got == want


def test_motif_group_batching(genome, monkeypatch):
    """Whole-database scans split into motif groups (round 3): grouped
    results must equal the single-group scan, ids correctly offset."""
    from lightmotif_tpu.ops import kernels

    motifs = make_motifs() + [p.reverse_complement()
                              for p in make_motifs()]
    ths = [-10.0, -3.0, -5.0] * 2
    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        want = [(h.motif, h.position, h.score)
                for h in MultiScanner(motifs, genome, ths).collect()]
        monkeypatch.setattr(MultiScanner, "GROUP_MOTIFS", 2)
        got = [(h.motif, h.position, h.score)
               for h in MultiScanner(motifs, genome, ths).collect()]
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
    assert want and got == want


def test_single_bucket_identical_hits(genome, monkeypatch):
    """single_bucket=True (the CLI's one-program mode) buckets every
    group to the global live maximum: identical hits, one shared
    m_max across groups."""
    from lightmotif_tpu.ops import kernels

    motifs = make_motifs() + [p.reverse_complement()
                              for p in make_motifs()]
    ths = [-10.0, -3.0, -5.0] * 2
    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        monkeypatch.setattr(MultiScanner, "GROUP_MOTIFS", 2)
        want = [(h.motif, h.position, h.score)
                for h in MultiScanner(motifs, genome, ths).collect()]
        ms = MultiScanner(motifs, genome, ths, single_bucket=True)
        got = [(h.motif, h.position, h.score) for h in ms.collect()]
        m_maxes = {g["m_max"] for g in ms._dev["groups"]}
        assert len(m_maxes) == 1
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
    assert want and got == want


def test_unreachable_motifs_pruned_from_groups(genome, monkeypatch):
    """Unreachable-threshold motifs pack into NO group (they contribute
    zero hits by proof): a database where half the motifs cannot reach
    their thresholds packs half the groups, with identical hits."""
    from lightmotif_tpu.ops import kernels

    motifs = make_motifs() + [p.reverse_complement()
                              for p in make_motifs()]
    ths = [-10.0, 1e9, -5.0, 1e9, 1e9, -3.0]
    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        monkeypatch.setattr(MultiScanner, "GROUP_MOTIFS", 3)
        ms = MultiScanner(motifs, genome, ths)
        got = [(h.motif, h.position, h.score) for h in ms.collect()]
        # only the 3 reachable motifs packed: one group, not two
        assert len(ms._dev["groups"]) == 1
        assert sorted(ms._dev["groups"][0]["ids"].tolist()) == [0, 2, 5]
        want = sorted(
            (i, h.position, h.score)
            for i in (0, 2, 5)
            for h in Scanner(motifs[i], genome, threshold=ths[i]))
        assert got == want and got

        # every threshold unreachable: no groups, no dispatches, no hits
        ms2 = MultiScanner(motifs, genome, [1e9] * 6)
        assert ms2.collect() == []
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()


@pytest.mark.parametrize("dense_limit", [None, 64])
def test_long_motif_edge_cases(genome, monkeypatch, dense_limit):
    """Long-motif (m=80) edge cases on BOTH routes: the default
    geometric limit sends it through the fused u16 prefilter, the
    DENSE_M_LIMIT=64 override through the dense exact-f32 path.
    Covers the capacity ratchet, -inf threshold (keep every window),
    and sequences shorter than the motif."""
    from lightmotif_tpu.ops import kernels

    monkeypatch.setattr(MultiScanner, "DENSE_M_LIMIT", dense_limit)
    rng = np.random.default_rng(77)
    sites = ["".join("ACTG"[j] for j in rng.integers(0, 4, size=80))
             for _ in range(3)]
    long_pssm = CountMatrix.from_sequences(
        EncodedSequence.encode(s) for s in sites
    ).to_freq(0.1).to_weight(None).to_scoring()
    short_pssm = build_pssm()
    seq = EncodedSequence(rng.integers(0, 4, size=5000, dtype=np.uint8))

    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        # capacity 8 forces the dense-path ratchet (every window is a
        # hit at -inf threshold: 5000 - 80 + 1 = 4921 hits)
        ms = MultiScanner([short_pssm, long_pssm],
                          thresholds=[-8.0, -np.inf], capacity=8)
        mo, pos, sc = ms.scan_arrays(seq)
        n_long = len(seq) - len(long_pssm) + 1
        sel = mo == 1
        assert int(sel.sum()) == n_long
        host = np.asarray(long_pssm.score_host(seq))
        assert np.array_equal(sc[sel], host)
        assert np.array_equal(pos[sel], np.arange(n_long))
        # a sequence shorter than the long motif: no long hits, no crash
        tiny = EncodedSequence(
            rng.integers(0, 4, size=40, dtype=np.uint8))
        ms2 = MultiScanner([short_pssm, long_pssm],
                           thresholds=[-8.0, -np.inf])
        mo2, _, _ = ms2.scan_arrays(tiny)
        assert not (mo2 == 1).any()
        assert (mo2 == 0).any()
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()


def test_fine_filters_exact_and_sound():
    """u16 refined phase-C machinery: the hi/lo byte split reproduces
    ``sum16 - t16`` exactly, and the refined test never rejects a
    window whose f32 score passes (soundness: no false negatives)."""
    from lightmotif_tpu.ops import multi, multi_kernel

    rng = np.random.default_rng(99)
    k = 5
    m_max = 13
    mcount = 6
    pssm_stack = rng.normal(0.0, 3.0, size=(mcount, m_max, k)).astype(
        np.float32)
    pssm_stack[:, :, k - 1] = 0.0          # wildcard column
    pssm_stack[0, 2, 1] = -np.inf          # an impossible symbol
    pssm_stack[3, m_max - 3:] = 0.0        # a shorter (zero-padded) motif

    d16, f16, off16 = multi.fine_discretize(pssm_stack)
    # cell-wise over-estimation against the function's own offset rule
    # (-inf cells replaced by -max_score, reference pwm/mod.rs:667-680)
    for mo in range(mcount):
        body = pssm_stack[mo].astype(np.float64)
        max_score = np.where(np.isfinite(body[:, :k - 1]),
                             body[:, :k - 1], -np.inf).max(axis=1).sum()
        repl = np.where(np.isinf(body[:, :k - 1]), -max_score,
                        body[:, :k - 1])
        offs = repl.min(axis=1)
        assert np.isclose(offs.sum(), off16[mo])
        y = (body - offs[:, None]) / f16[mo]
        finite = np.isfinite(y)
        assert (d16[mo][finite] >= np.floor(y[finite])).all()
        assert d16[mo].max() <= 65535

    thresholds = np.array([-20.0, -5.0, 0.0, -np.inf, 1e9, -3.0],
                          np.float64)
    t16 = multi.fine_thresholds(thresholds, f16, off16)
    assert t16[3] == 0            # -inf -> all-pass
    # FINITE above-range thresholds stay reachable (wildcard cells may
    # exceed the body-only max_score; saturated window sums hit 65535);
    # only non-finite sentinels never pass
    assert t16[4] == 65535
    assert multi.fine_thresholds(
        np.array([np.inf]), f16[:1], off16[:1])[0] == 65536
    f_hi, f_lo = multi.pack_filters_fine(d16, t16, k)

    # emulate phase_c's matmul on random windows and check exactness +
    # soundness against the f32 sequential-add oracle
    lanes = multi_kernel._lanes_for(k)
    rpb = multi_kernel.MAX_MK // lanes
    n_blocks = -(-m_max // rpb)
    seq = rng.integers(0, k - 1, size=4000).astype(np.int64)
    for start in rng.integers(0, len(seq) - m_max, size=200):
        win = seq[start:start + m_max]
        x = np.zeros(n_blocks * multi_kernel.MAX_MK, np.float64)
        for j, s in enumerate(win):
            x[(j // rpb) * multi_kernel.MAX_MK + (j % rpb) * lanes + s] = 1
        x[lanes - 1] = 1  # constant threshold slot
        part16 = 256.0 * (x @ f_hi.astype(np.float64)) \
            + x @ f_lo.astype(np.float64)
        for mo in range(mcount):
            s16 = int(sum(d16[mo, j, s] for j, s in enumerate(win)))
            if t16[mo] <= 65535:
                assert part16[mo] == s16 - int(t16[mo])
            else:
                assert part16[mo] < 0  # never-pass guard
            # soundness: f32 score passing implies refined test passes
            f32 = np.float32(0.0)
            for j, s in enumerate(win):
                f32 = np.float32(f32 + pssm_stack[mo, j, s])
            if np.isfinite(thresholds[mo]) and f32 >= thresholds[mo]:
                assert part16[mo] >= 0, (mo, start, f32, thresholds[mo])


def test_dispatch_fetch_pipelined_rebind(genome):
    """Token-pinning contract: bind()+dispatch() of the next sequence
    before fetch() of the previous one must not corrupt either result
    (the CLI overlaps flights this way), even when fetched out of
    order."""
    motifs = make_motifs()
    thresholds = [-10.0, -3.0, -5.0]
    rng = np.random.default_rng(7)
    g2 = EncodedSequence.encode(
        "".join(rng.choice(list("ACGT"), size=30_000)))

    ms = MultiScanner(motifs, genome, thresholds)
    tok1 = ms.dispatch()
    ms.bind(g2)
    tok2 = ms.dispatch()
    got2 = ms.fetch(tok2)  # out of order on purpose
    got1 = ms.fetch(tok1)

    exp1 = MultiScanner(motifs, genome, thresholds).collect_arrays()
    exp2 = MultiScanner(motifs, g2, thresholds).collect_arrays()
    for got, exp in ((got1, exp1), (got2, exp2)):
        for a, b in zip(got, exp):
            np.testing.assert_array_equal(a, b)


def test_dispatch_fetch_retry_after_rebind(genome):
    """Capacity-ratchet retries inside fetch() re-launch against the
    token's pinned device buffers, not the currently bound sequence:
    a tiny initial capacity forces the retry after the scanner has
    been rebound to a different genome."""
    motifs = make_motifs()
    thresholds = [-12.0, -4.0, -6.0]  # plenty of candidates
    rng = np.random.default_rng(11)
    g2 = EncodedSequence.encode(
        "".join(rng.choice(list("ACGT"), size=20_000)))

    ms = MultiScanner(motifs, genome, thresholds, capacity=8)
    tok1 = ms.dispatch()
    ms.bind(g2)
    tok2 = ms.dispatch()
    got1 = ms.fetch(tok1)  # must retry (cap=8) against genome, not g2
    got2 = ms.fetch(tok2)

    exp1 = MultiScanner(motifs, genome, thresholds).collect_arrays()
    exp2 = MultiScanner(motifs, g2, thresholds).collect_arrays()
    assert got1[1].size > 8  # the retry actually happened
    for got, exp in ((got1, exp1), (got2, exp2)):
        for a, b in zip(got, exp):
            np.testing.assert_array_equal(a, b)


def test_batch_dispatch_fetch_pipelined():
    """MultiBatchScanner.dispatch/fetch: tokens snapshot their own
    record offsets, so rebinding the next flight before fetching the
    previous one yields both flights' per-record hits intact."""
    from lightmotif_tpu.batch import MultiBatchScanner

    motifs = make_motifs()
    thresholds = [-10.0, -3.0, -5.0]
    rng = np.random.default_rng(21)

    def records(n, seed):
        r = np.random.default_rng(seed)
        return [
            EncodedSequence.encode(
                "".join(r.choice(list("ACGT"),
                                 size=int(r.integers(200, 3000)))))
            for _ in range(n)
        ]

    flight1, flight2 = records(5, 1), records(7, 2)
    mbs = MultiBatchScanner(motifs, flight1, thresholds)
    tok1 = mbs.dispatch()
    mbs.rebind_prepared(mbs.prepare(flight2))
    tok2 = mbs.dispatch()
    got1 = mbs.fetch(tok1)
    got2 = mbs.fetch(tok2)

    exp1 = MultiBatchScanner(motifs, flight1, thresholds).collect_arrays()
    exp2 = MultiBatchScanner(motifs, flight2, thresholds).collect_arrays()
    for got, exp in ((got1, exp1), (got2, exp2)):
        for a, b in zip(got, exp):
            np.testing.assert_array_equal(a, b)


def test_fused_u16_wildcard_above_body_max_soundness():
    """Regression: a hand-built ScoringMatrix may put wildcard cells
    above its row body max, so true window scores can exceed the
    body-only ``max_score``.  A finite threshold past the u16 range
    must stay REACHABLE (clamp to 65535, the u8 path's saturate-at-255
    analogue) -- it used to map to the never-pass sentinel and the
    fused scan silently missed hits the exact rescore would keep."""
    from lightmotif_tpu.alphabet import DNA
    from lightmotif_tpu.matrix import ScoringMatrix
    from lightmotif_tpu.ops import kernels, multi

    pssm = ScoringMatrix(DNA, np.asarray([
        [2.0, -3.0, -3.0, -3.0, 0.0],
        [-1.0, -1.0, -1.0, -1.0, 0.0],
    ], np.float32))
    assert pssm.max_score() == 1.0  # body-only, like the reference

    # threshold above the body-only max: only wildcard windows reach it
    threshold = 1.5
    d16, f16, off16 = multi.fine_discretize(
        np.asarray(pssm.data, np.float32)[None])
    t16 = multi.fine_thresholds(np.asarray([threshold]), f16, off16)
    assert t16[0] == 65535  # reachable, not the never-pass 65536
    assert multi.fine_thresholds(np.asarray([np.inf]), f16, off16)[0] \
        == 65536  # padded slots stay never-pass
    assert multi.fine_thresholds(np.asarray([-np.inf]), f16, off16)[0] \
        == 0

    seq = EncodedSequence.encode("ACGTANCCGT")  # 'AN' at position 4
    want = sorted(
        (h.position, h.score)
        for h in Scanner(pssm, seq, threshold=threshold))
    assert want, "oracle found no wildcard hit; test setup is wrong"

    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        got = sorted(
            (h.position, h.score)
            for h in MultiScanner([pssm], seq, [threshold]).collect())
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
    assert got == want


def test_unreachable_threshold_folds_to_never_pass():
    """Short motifs at tight p-values get thresholds NO window can
    reach; the packer must fold them to the never-pass guard (their
    perfect-consensus windows would otherwise saturate the u16 filter
    and flood the pair stages -- ~1M false pairs on a whole-JASPAR
    E. coli scan), while keeping exactly-reachable thresholds live."""
    from lightmotif_tpu.alphabet import DNA
    from lightmotif_tpu.matrix import ScoringMatrix
    from lightmotif_tpu.ops import kernels, multi

    data = np.asarray([
        [2.0, -3.0, -3.0, -3.0, 0.0],
        [-1.0, 3.0, -1.0, -1.0, 0.0],
        [-2.0, -2.0, 1.0, -2.0, 0.0],
    ], np.float32)
    pssm = ScoringMatrix(DNA, data)
    best = float(np.float32(np.float32(2.0) + np.float32(3.0))
                 + np.float32(1.0))  # sequential f32 max window score

    un = multi.unreachable_thresholds(
        data[None].repeat(4, axis=0),
        np.asarray([best, best + 0.1, np.inf, -np.inf]))
    assert un.tolist() == [False, True, False, False]

    # all--inf row: any finite threshold is unreachable
    dinf = data.copy()
    dinf[1] = -np.inf
    assert multi.unreachable_thresholds(
        dinf[None], np.asarray([-100.0]))[0]

    # end-to-end: an unreachable-threshold motif contributes no hits
    # and no candidates, a reachable one keeps its exact hit set
    reach = ScoringMatrix(DNA, data)
    seq = EncodedSequence.encode("ACTACGACTACT")
    want = sorted((1, h.position, h.score)
                  for h in Scanner(reach, seq, threshold=best))
    assert want, "no perfect-match hit; test setup is wrong"
    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        got = sorted(
            (h.motif, h.position, h.score)
            for h in MultiScanner(
                [pssm, reach], seq,
                [best + 0.1, best]).collect())
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
    assert got == want


def test_dense_bucket_shares_one_compile(monkeypatch):
    """Two long motifs whose lengths share a 32-row dense bucket run
    ONE compiled dense program: the true valid-window count is traced
    and every static shape (pssm rows, n_scores bound) is a function
    of the bucket only.  A whole database of long motifs must not pay
    one 30-60 s remote compile per distinct length."""
    from lightmotif_tpu.scanner import _dense_motif_scan_fn

    monkeypatch.setattr(MultiScanner, "DENSE_M_LIMIT", 64)
    rng = np.random.default_rng(5)
    pssms = []
    for m in (70, 75, 96):  # all bucket to m_b = 96
        sites = ["".join("ACTG"[j] for j in rng.integers(0, 4, size=m))
                 for _ in range(3)]
        pssms.append(CountMatrix.from_sequences(
            EncodedSequence.encode(s) for s in sites
        ).to_freq(0.1).to_weight(None).to_scoring())
    seq = EncodedSequence(rng.integers(0, 4, size=3000, dtype=np.uint8))

    fn = _dense_motif_scan_fn()
    before = fn._cache_size()
    ms = MultiScanner(pssms, thresholds=-np.inf, capacity=8192)
    mo, pos, sc = ms.scan_arrays(seq)
    assert fn._cache_size() == before + 1
    for i, p in enumerate(pssms):
        host = np.asarray(p.score_host(seq))
        sel = mo == i
        assert int(sel.sum()) == len(host)
        assert np.array_equal(sc[sel], host)
        assert np.array_equal(pos[sel], np.arange(len(host)))
    # a rescan reuses the device-cached dense PSSMs (no re-upload)
    cached = dict(ms._dense_dev)
    mo2, pos2, sc2 = ms.scan_arrays(
        EncodedSequence(rng.integers(0, 4, size=3000, dtype=np.uint8)))
    for i, arr in cached.items():
        assert ms._dense_dev[i] is arr


def test_head_hint_covers_steady_state_hits(genome):
    """Sticky head widths: after a scan whose hit count exceeds the
    default head, the NEXT dispatch's head slice covers it, so fetch
    needs no second ``packed`` transfer (scanner.py::_head_slots)."""
    from lightmotif_tpu import scanner as scanner_mod

    motifs = make_motifs()
    # very permissive thresholds -> tens of thousands of hits
    ms = MultiScanner(motifs, genome, [-50.0, -30.0, -30.0])
    mo, pos, sc = ms.scan_arrays(genome)
    n_hits = len(mo)
    assert n_hits > scanner_mod.HEAD_SLOTS  # the scenario under test
    # the fused group's hint now records the settled n_kept
    total_hint = sum(v for k, v in ms._head_hint.items())
    assert total_hint == n_hits
    # next dispatch sizes every head to cover its group's hint
    token = ms._dispatch_raw()
    for e in token["entries"]:
        key = e["gi"] if e["kind"] == "fused" else ("dense", e["i"])
        hint = ms._head_hint.get(key, 0)
        head = e["head"]
        # fused heads are (pos i32, motif u16, score-bits i32) tuples;
        # dense heads stay [rows, w] arrays
        width = head[0].shape[0] if isinstance(head, tuple) \
            else head.shape[1]
        assert width >= min(hint, e.get("cap_hits", e["cap"]))
    # and the results are unchanged (head-or-full protocol is lossless)
    mo2, pos2, sc2 = ms._fetch_raw(token)
    assert np.array_equal(mo, mo2)
    assert np.array_equal(pos, pos2)
    assert np.array_equal(sc, sc2)


def _ragged_motif_set(rng, n_short=246, n_long=8, n_xlong=2):
    """A length-sorted motif set whose contraction blocks are ragged:
    most motifs fit block 0 (m <= 16), a handful reach block 1, two
    reach block 2 (m = 33)."""
    from lightmotif_tpu import CountMatrix, EncodedSequence

    def mk(width):
        sites = ["".join("ACTG"[j] for j in rng.integers(0, 4, size=width))
                 for _ in range(4)]
        cm = CountMatrix.from_sequences(
            EncodedSequence.encode(s) for s in sites)
        return cm.to_freq(0.1).to_scoring(None)

    widths = ([int(w) for w in rng.integers(6, 15, size=n_short)]
              + [int(w) for w in rng.integers(17, 25, size=n_long)]
              + [33] * n_xlong)
    return [mk(w) for w in sorted(widths)]


def test_ragged_widths_values():
    """ragged_widths derives per-block suffix widths from filter
    content: 128-lane-aligned, non-increasing, covering every nonzero
    column."""
    from lightmotif_tpu.ops import multi

    rng = np.random.default_rng(71)
    motifs = _ragged_motif_set(rng)
    k = 5
    stack, lengths = multi.stack_motifs(
        [np.asarray(p.data, np.float32) for p in motifs], k)
    g = multi.pack_motif_group(
        np.arange(len(motifs)), len(motifs), int(lengths.max()),
        stack, np.full(len(motifs), -20.0, np.float32), k)
    widths = g["widths"]
    m_pad = g["f_hi"].shape[1]
    assert m_pad == 256 and len(widths) == 3
    assert widths[0] == m_pad
    assert widths[1] == 128 and widths[2] == 128  # 10 long motifs
    # every nonzero filter column of block b lies within the suffix
    for b, w in enumerate(widths):
        rows = slice(b * 128, (b + 1) * 128)
        nz = (np.abs(g["f_hi"][rows]) + np.abs(g["f_lo"][rows])).any(0)
        assert not nz[: m_pad - w].any()


def test_ragged_widths_zero_middle_block():
    """A motif whose block-1 rows discretize to all-zero but whose
    block-2 rows do not must still widen block 1 (non-increasing
    widths are a kernel invariant)."""
    from lightmotif_tpu.ops import multi

    k = 5
    m = 33
    # 240 trivially short motifs + 1 crafted long one at the END
    stack = np.zeros((241, m, k), np.float32)
    stack[:, :6, :4] = np.linspace(0.5, 2.0, 241)[:, None, None]
    crafted = np.zeros((m, k), np.float32)
    crafted[:16, :4] = [1.0, 2.0, 3.0, 4.0]   # block 0: content
    crafted[16:32] = 0.25                     # block 1: uniform rows
    crafted[32, :4] = [5.0, 1.0, 1.0, 1.0]    # block 2: content
    stack[-1] = crafted
    g = multi.pack_motif_group(
        np.arange(241), 241, m, stack,
        np.full(241, -5.0, np.float32), k)
    widths = g["widths"]
    assert len(widths) == 3
    # block 2 needs the last motif; block 1 must cover at least that
    assert widths[1] >= widths[2] >= 128
    rows2 = slice(2 * 128, 3 * 128)
    nz2 = (np.abs(g["f_hi"][rows2]) + np.abs(g["f_lo"][rows2])).any(0)
    assert nz2.any()
    assert not nz2[: g["f_hi"].shape[1] - widths[2]].any()


def test_ragged_prefilter_and_core_parity():
    """prefilter_any16 and scan_multi_segment_fused produce identical
    results with ragged widths and with full widths."""
    import jax.numpy as jnp

    from lightmotif_tpu.ops import kernels, multi, multi_kernel

    rng = np.random.default_rng(72)
    motifs = _ragged_motif_set(rng)
    k = 5
    stack, lengths = multi.stack_motifs(
        [np.asarray(p.data, np.float32) for p in motifs], k)
    m_max = int(lengths.max())
    ths = np.full(len(motifs), -8.0, np.float32)
    g = multi.pack_motif_group(
        np.arange(len(motifs)), len(motifs), m_max, stack, ths, k)
    assert g["widths"][1] < g["f_hi"].shape[1]  # raggedness engages

    tile = 8192  # the auto _tile_for choice at this m_pad/block count
    data = rng.integers(0, 4, size=tile, dtype=np.int8)
    seq = jnp.asarray(data)
    n_here = np.zeros((1, g["f_hi"].shape[1]), np.int32)
    n_here[0, : len(motifs)] = np.maximum(
        data.size - lengths + 1, 0)

    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        f_hi = jnp.asarray(g["f_hi"])
        f_lo = jnp.asarray(g["f_lo"])
        full = np.asarray(multi_kernel.prefilter_any16(
            seq, f_hi, f_lo, m_max, k, tile=tile))
        ragged = np.asarray(multi_kernel.prefilter_any16(
            seq, f_hi, f_lo, m_max, k, tile=tile,
            widths=g["widths"]))
        assert np.array_equal(full, ragged)

        args = (seq, np.int32(0), jnp.asarray(n_here), None,
                jnp.asarray(g["pssm"]), jnp.asarray(g["th"]))
        kw = dict(chunk_len=tile, cap=4096, m_max=m_max, k=k,
                  dense=False, cap_hits=4096,
                  filters_fine=(f_hi, f_lo))
        c_full, p_full = multi.scan_multi_segment_fused(*args, **kw)
        c_rag, p_rag = multi.scan_multi_segment_fused(
            *args, **kw, widths=g["widths"])
        assert np.array_equal(np.asarray(c_full), np.asarray(c_rag))
        assert np.array_equal(np.asarray(p_full), np.asarray(p_rag))
        n_kept = int(np.asarray(c_rag)[2])
        assert n_kept > 0  # the comparison is not vacuous
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()


def test_int8_prefilter_parity():
    """prefilter_any8 (int8 MXU path) matches prefilter_any16 in
    candidate signs everywhere and in values wherever the max is
    achieved by a live motif (never-pass sentinels differ by design,
    both negative)."""
    import jax.numpy as jnp

    from lightmotif_tpu.ops import kernels, multi, multi_kernel

    rng = np.random.default_rng(73)
    motifs = _ragged_motif_set(rng)
    k = 5
    stack, lengths = multi.stack_motifs(
        [np.asarray(p.data, np.float32) for p in motifs], k)
    m_max = int(lengths.max())
    ths = np.full(len(motifs), -6.0, np.float32)
    # mark a few motifs unreachable to exercise the -2^26 sentinel
    ths[:3] = 1e6
    g = multi.pack_motif_group(
        np.arange(len(motifs)), len(motifs), m_max, stack, ths, k)

    tile = 8192
    data = rng.integers(0, 5, size=tile, dtype=np.int8)  # incl wildcard
    seq = jnp.asarray(data)

    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        ref = np.asarray(multi_kernel.prefilter_any16(
            seq, jnp.asarray(g["f_hi"]), jnp.asarray(g["f_lo"]),
            m_max, k, tile=tile, widths=g["widths"])).reshape(-1)
        got = np.asarray(multi_kernel.prefilter_any8(
            seq, jnp.asarray(g["f_hi8"]), jnp.asarray(g["f_lo8"]),
            jnp.asarray(g["adj"]), m_max, k, tile=tile,
            widths=g["widths"])).reshape(-1)
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
    n_valid = data.size - m_max + 1
    r, o = ref[:n_valid], got[:n_valid]
    assert np.array_equal(r >= 0, o >= 0)
    assert (o >= 0).any()  # not vacuous
    assert np.array_equal(r[o >= 0], o[o >= 0])


def test_pairs_per_position_ratchet(genome):
    """A position hitting more motifs than the extraction's per-row
    slot budget (R = cap_hits / 4096, floor 8) must grow cap_hits via
    the normal retry and lose no hits."""
    motifs = make_motifs()[:1] * 12  # 12 identical motifs
    ms = MultiScanner(motifs, genome, -10.0, capacity=4096)
    # capacity 4096 -> seed cap_hits 4096 -> R = 8 < 12 pairs per hit
    # position: the first fetch must ratchet, the result stays exact
    got = ms.collect()
    want = MultiScanner(motifs[:1], genome, -10.0).collect()
    assert len(got) == 12 * len(want) and len(want) > 0
    for mid in range(12):
        sub = [(h.position, h.score) for h in got if h.motif == mid]
        assert sub == [(h.position, h.score) for h in want]


def test_gather_windows_matches_direct():
    """Packed-word window reads == direct byte gathers for every
    alignment phase, odd lengths, protein ranks, and clamped tails."""
    import jax.numpy as jnp

    from lightmotif_tpu.ops import multi

    rng = np.random.default_rng(74)
    for lp, m, kmax in ((1001, 33, 5), (4096, 48, 21), (57, 7, 5)):
        seq = jnp.asarray(rng.integers(0, kmax, size=lp).astype(np.int8))
        words = multi.pack_words(seq)
        pos = jnp.asarray(np.concatenate([
            rng.integers(0, lp, size=500),
            np.array([0, 1, 2, 3, lp - 1, lp - 2]),
        ]).astype(np.int32))
        got = np.asarray(multi.gather_windows(words, pos, m))
        flat = np.asarray(seq)
        for i, p in enumerate(np.asarray(pos)):
            if p + m <= lp:
                # fully in-range windows read exact symbols
                assert np.array_equal(got[i], flat[p:p + m]), (lp, m, p)
            else:
                # the in-range prefix must still be exact (tails feed
                # zero-padded PSSM rows downstream)
                n = lp - p
                assert np.array_equal(got[i, :n], flat[p:p + n]), (lp, m, p)


def test_staged_rescore_matches_flat():
    """rescore_multi_staged == rescore_multi bit-for-bit on a ragged
    motif set (mixed lengths across 3 contraction blocks, live-count
    boundary, dead-pair padding)."""
    import jax.numpy as jnp

    from lightmotif_tpu.ops import multi

    rng = np.random.default_rng(75)
    motifs = _ragged_motif_set(rng)
    k = 5
    stack, lengths = multi.stack_motifs(
        [np.asarray(p.data, np.float32) for p in motifs], k)
    m_max = int(lengths.max())
    g = multi.pack_motif_group(
        np.arange(len(motifs)), len(motifs), m_max, stack,
        np.full(len(motifs), -8.0, np.float32), k)
    assert g["rsplits"] and g["rsplits"][0] < len(motifs)

    lp = 6000
    chunk = jnp.asarray(rng.integers(0, 5, size=lp).astype(np.int8))
    n_pairs = 1500
    cap = 4096
    pos = np.zeros(cap, np.int32)
    mo = np.zeros(cap, np.int32)
    pos[:n_pairs] = np.sort(rng.integers(0, lp - m_max, n_pairs))
    mo[:n_pairs] = rng.integers(0, len(motifs), n_pairs)
    # dead slots hold clamped sentinels like the extraction emits
    pos[n_pairs:] = lp
    mo[n_pairs:] = len(motifs) - 1
    pssms = jnp.asarray(g["pssm"])
    flat = np.asarray(multi.rescore_multi(
        chunk, pssms, jnp.asarray(pos), jnp.asarray(mo),
        n_live=jnp.int32(n_pairs)))
    staged = np.asarray(multi.rescore_multi_staged(
        chunk, pssms, jnp.asarray(pos), jnp.asarray(mo),
        jnp.int32(n_pairs), g["rsplits"], 16))
    assert np.array_equal(flat[:n_pairs], staged[:n_pairs])
    # and both equal the public scalar oracle on a sample
    for i in rng.integers(0, n_pairs, 25):
        mid = int(mo[i])
        m_i = int(lengths[mid])
        if pos[i] + m_i <= lp:
            want = motifs[mid].score_position(
                EncodedSequence(np.asarray(chunk).astype(np.uint8)),
                int(pos[i]))
            assert np.float32(staged[i]) == np.float32(want), i


def test_ragged_core_with_rsplits_parity():
    """scan_multi_segment_fused with rsplits (staged rescore) ==
    without (flat rescore)."""
    import jax.numpy as jnp

    from lightmotif_tpu.ops import kernels, multi

    rng = np.random.default_rng(76)
    motifs = _ragged_motif_set(rng)
    k = 5
    stack, lengths = multi.stack_motifs(
        [np.asarray(p.data, np.float32) for p in motifs], k)
    m_max = int(lengths.max())
    ths = np.full(len(motifs), -8.0, np.float32)
    g = multi.pack_motif_group(
        np.arange(len(motifs)), len(motifs), m_max, stack, ths, k)
    tile = 8192
    data = rng.integers(0, 4, size=tile, dtype=np.int8)
    seq = jnp.asarray(data)
    n_here = np.zeros((1, g["f_hi"].shape[1]), np.int32)
    n_here[0, : len(motifs)] = np.maximum(data.size - lengths + 1, 0)

    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        f_hi = jnp.asarray(g["f_hi"])
        f_lo = jnp.asarray(g["f_lo"])
        args = (seq, np.int32(0), jnp.asarray(n_here), None,
                jnp.asarray(g["pssm"]), jnp.asarray(g["th"]))
        kw = dict(chunk_len=tile, cap=4096, m_max=m_max, k=k,
                  dense=False, cap_hits=4096,
                  filters_fine=(f_hi, f_lo), widths=g["widths"])
        c0, p0 = multi.scan_multi_segment_fused(*args, **kw)
        c1, p1 = multi.scan_multi_segment_fused(
            *args, **kw, rsplits=g["rsplits"])
        assert np.array_equal(np.asarray(c0), np.asarray(c1))
        assert np.array_equal(np.asarray(p0), np.asarray(p1))
        assert int(np.asarray(c1)[2]) > 0
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()


def test_rescore_prefix4_bit_parity():
    """Round-5 lever: the prefix-4 table rescore (one gather holding
    the EXACT f32 sequential sum of rows 0..3) must be bit-identical
    to the plain ascending-j rescore and to score_position, for every
    motif length incl. m < 4 zero-padded rows and wildcard symbols."""
    import jax.numpy as jnp

    from lightmotif_tpu.ops import multi

    rng = np.random.default_rng(0x5EED)
    motifs = []
    for m in (3, 6, 15, 33):
        sites = ["".join("ACTG"[c] for c in rng.integers(0, 4, size=m))
                 for _ in range(4)]
        cm = CountMatrix.from_sequences(
            EncodedSequence.encode(s) for s in sites)
        motifs.append(cm.to_freq(0.1).to_weight(None).to_scoring())
    k = 5
    stack, lengths = multi.stack_motifs(
        [np.asarray(p.data, np.float32) for p in motifs], k)
    m_max = int(lengths.max())

    # pre4 built exactly like pack_motif_group does
    codes = np.arange(k ** 4)
    pre4 = stack[:, 0, :][:, codes // k ** 3 % k].astype(np.float32)
    for j, sj in ((1, codes // k ** 2 % k), (2, codes // k % k),
                  (3, codes % k)):
        pre4 = pre4 + stack[:, j, :][:, sj]
    pre4 = jnp.asarray(pre4.reshape(-1))

    # sequence with wildcards sprinkled in
    data = rng.integers(0, 4, size=400, dtype=np.uint8)
    data[rng.integers(0, 400, size=12)] = 4  # N
    seq = EncodedSequence(data)
    lp = len(seq)

    pos, mo = [], []
    for mi, p in enumerate(motifs):
        n = lp - len(p) + 1
        pos.extend(range(n))
        mo.extend([mi] * n)
    pos = np.asarray(pos, np.int32)
    mo = np.asarray(mo, np.int32)

    args = (jnp.asarray(data.astype(np.int8)), jnp.asarray(stack),
            jnp.asarray(pos), jnp.asarray(mo))
    plain = np.asarray(multi.rescore_multi(*args))
    with_pre = np.asarray(multi.rescore_multi(*args, pre4=pre4))
    assert np.array_equal(
        plain.view(np.int32), with_pre.view(np.int32))
    want = np.asarray(
        [motifs[m].score_position(seq, int(p))
         for p, m in zip(pos, mo)], np.float32)
    assert np.array_equal(with_pre.view(np.int32), want.view(np.int32))


def test_gather_windows_nibble_parity():
    """Nibble-packed window gathers read the same symbols as the byte
    packing for every window offset (spw=8 vs spw=4 vs direct)."""
    import jax.numpy as jnp

    from lightmotif_tpu.ops import multi

    rng = np.random.default_rng(3)
    data = rng.integers(0, 5, size=333, dtype=np.int8)
    dev = jnp.asarray(data)
    words4 = multi.pack_words(dev)
    words8 = multi.pack_nibbles(dev)
    for m in (1, 7, 16, 33):
        pos = np.arange(0, 333 - m, dtype=np.int32)
        w4 = np.asarray(multi.gather_windows(
            words4, jnp.asarray(pos), m))
        w8 = np.asarray(multi.gather_windows(
            words8, jnp.asarray(pos), m, spw=8))
        direct = np.stack([data[pos + j] for j in range(m)], axis=1)
        assert np.array_equal(w4, direct)
        assert np.array_equal(w8, direct)


def test_multi_segment_fused_parity(monkeypatch):
    """SEGMENT_CAP splits a genome into several fused segments (each
    program queues back-to-back, one fetch); hit sets must equal the
    single-segment scan and the host oracle across the seams."""
    import jax

    from lightmotif_tpu.ops import kernels
    from lightmotif_tpu.scanner import MultiScanner

    kernels.INTERPRET = True
    jax.clear_caches()
    rng = np.random.default_rng(0x5E6)
    motifs = []
    for m in (7, 15, 24):
        sites = ["".join("ACTG"[c] for c in rng.integers(0, 4, size=m))
                 for _ in range(4)]
        cm = CountMatrix.from_sequences(
            EncodedSequence.encode(s) for s in sites)
        motifs.append(cm.to_freq(0.1).to_weight(None).to_scoring())
    ths = [0.6 * float(p.max_score()) for p in motifs]
    seq = EncodedSequence(
        rng.integers(0, 4, size=150_000, dtype=np.uint8))

    def run():
        ms = MultiScanner(motifs, seq, thresholds=ths)
        return sorted((h.motif, h.position, np.float32(h.score))
                      for h in ms.collect())

    one_seg = run()
    # adaptive rule: genomes within one DEFAULT_SEGMENT stay unsplit,
    # so force splitting by shrinking both knobs (seg clamps to the
    # kernel-geometry unit -> ~5 segments on 150 kbp)
    from lightmotif_tpu import scanner as scanner_mod
    monkeypatch.setattr(scanner_mod, "DEFAULT_SEGMENT", 1)
    monkeypatch.setattr(MultiScanner, "SEGMENT_CAP", 1)
    many_seg = run()
    assert one_seg == many_seg
    want = []
    for mi, (p, t) in enumerate(zip(motifs, ths)):
        sc = np.asarray(p.score_host(seq))
        want += [(mi, int(x), np.float32(sc[x]))
                 for x in np.nonzero(sc >= np.float32(t))[0]]
    assert one_seg == sorted(want)


def test_head_width_ladder_properties():
    """The +25% head-width ladder: always covers the hint, never
    over-fetches more than 25% past it (above the 8192 floor), and
    keeps the number of distinct widths -- each one a separate
    compiled slice program on the remote chip -- logarithmically
    bounded (scanner.py::head_width)."""
    from lightmotif_tpu.scanner import HEAD_SLOTS, head_width

    cap = 1 << 22
    widths = set()
    for hint in [0, 1, HEAD_SLOTS, HEAD_SLOTS + 1, 20_000, 71_730,
                 100_000, 500_000, 1_000_000, cap]:
        w = head_width(hint, cap)
        widths.add(w)
        assert w >= min(hint, cap)  # covers the hint (up to cap)
        if hint > HEAD_SLOTS and w < cap:
            # waste bound: the previous rung was < hint, and rungs
            # grow by max(HEAD_SLOTS, 25%)
            assert w <= max(hint + HEAD_SLOTS, int(hint * 1.25) + 1)
    # program-count bound: every width to 128k slots is one of ~12
    all_widths = {head_width(h, cap) for h in range(0, 131072, 997)}
    assert len(all_widths) <= 14
    # capacity clamp
    assert head_width(10 * cap, cap) == cap
