"""Multi-device sharding tests on an 8-way virtual CPU mesh
(conftest sets ``xla_force_host_platform_device_count=8``)."""

import jax
import numpy as np
import pytest

from lightmotif_tpu import EncodedSequence
from lightmotif_tpu.parallel import (
    ShardedScanner,
    make_genome_mesh,
    shard_sequence,
    sharded_argmax,
)
from lightmotif_tpu.scanner import Scanner

from .data import build_pssm


@pytest.fixture(scope="module")
def pssm():
    return build_pssm()


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(123)
    text = "".join(rng.choice(list("ACGT"), size=300_000))
    return EncodedSequence.encode(text)


def test_mesh_has_8_devices():
    mesh = make_genome_mesh()
    assert mesh.devices.size == 8


def test_shard_sequence_halo(pssm):
    enc = np.arange(100, dtype=np.int8) % 4
    shards, chunk, n_scores = shard_sequence(enc, 4, len(pssm), 4, pad_multiple=32)
    assert n_scores == 100 - len(pssm) + 1
    assert shards.shape == (4, chunk + len(pssm) - 1)
    # halo: shard 0's tail overlaps shard 1's head
    assert np.array_equal(shards[0, chunk : chunk + 14], shards[1, :14])


def test_sharded_scan_matches_single_device(pssm, genome):
    threshold = -12.0
    single = sorted(
        (h.position, h.score) for h in Scanner(pssm, genome, threshold=threshold)
    )
    sharded = ShardedScanner(pssm, genome, threshold=threshold)
    multi = sorted((h.position, h.score) for h in sharded.collect())
    assert [p for p, _ in multi] == [p for p, _ in single]
    for (p1, s1), (p2, s2) in zip(multi, single):
        assert s1 == pytest.approx(s2, abs=1e-5)


def test_sharded_argmax_matches_host(pssm, genome):
    gmax, garg = sharded_argmax(np.asarray(pssm.data), np.asarray(genome.data))
    host = pssm.score_host(genome)
    assert gmax == pytest.approx(float(host.max()), abs=1e-5)
    hmax = host.max()
    expected_arg = int(np.nonzero(host == hmax)[0][-1])
    assert garg == expected_arg


def test_sharded_scanner_max(pssm, genome):
    hit = ShardedScanner(pssm, genome, threshold=-12.0).max()
    host = pssm.score_host(genome)
    assert hit.score == pytest.approx(float(host.max()), abs=1e-5)


def test_sharded_scan_runs_production_kernel(pssm, genome, monkeypatch):
    """VERDICT round-2 task 1: the per-shard device program must be the
    same Pallas kernel as the single-chip scanner -- spy on
    ``kernels._score_chunked`` while the shard bodies trace."""
    from lightmotif_tpu.ops import kernels
    from lightmotif_tpu.parallel import sharded_argmax, sharded_scan

    calls = []
    real = kernels._score_chunked

    def spy(seq, table, n_scores, block_lanes, discrete):
        calls.append((seq.shape, block_lanes, discrete))
        return real(seq, table, n_scores, block_lanes, discrete)

    monkeypatch.setattr(kernels, "_score_chunked", spy)
    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        threshold = -10.0
        dm = pssm.to_discrete()
        positions, scores = sharded_scan(
            np.asarray(pssm.data),
            np.asarray(dm.data),
            np.asarray(genome.data, np.int8),
            threshold,
            dm.scale(threshold),
            pad_unit=1024,
        )
        assert any(d for _, _, d in calls), "u8 Pallas kernel not traced"
        gmax, garg = sharded_argmax(
            np.asarray(pssm.data), np.asarray(genome.data, np.int8),
            pad_unit=1024)
        assert any(not d for _, _, d in calls), "f32 kernel not traced"
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
    # bit parity with the host oracle on both paths
    host = np.asarray(pssm.score_host(genome))
    want = np.nonzero(host >= threshold)[0]
    assert np.array_equal(positions, want)
    assert np.array_equal(scores, host[want])
    assert np.float32(gmax) == host.max()
    assert garg == int(np.nonzero(host == host.max())[0][-1])


def test_sharded_multi_scan_matches_single(genome_mesh=None):
    import numpy as np

    from lightmotif_tpu import CountMatrix, EncodedSequence
    from lightmotif_tpu.ops import kernels
    from lightmotif_tpu.parallel import make_genome_mesh, sharded_multi_scan
    from lightmotif_tpu.scanner import MultiScanner

    rng = np.random.default_rng(21)
    motifs = []
    for width in (8, 14, 20):
        sites = [
            "".join("ACTG"[j] for j in rng.integers(0, 4, size=width))
            for _ in range(5)
        ]
        cm = CountMatrix.from_sequences(
            EncodedSequence.encode(s) for s in sites)
        motifs.append(cm.to_freq(0.1).to_weight(None).to_scoring())
    genome = rng.integers(0, 4, size=60_000, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))

    kernels.INTERPRET = True
    jax.clear_caches()  # flag is baked into traced executables
    try:
        mesh = make_genome_mesh()
        hits = sharded_multi_scan(motifs, genome, -6.0, mesh=mesh)
        single = MultiScanner(motifs, seq, -6.0).collect()
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
    a = [(h.motif, h.position, h.score) for h in hits]
    b = [(h.motif, h.position, h.score) for h in single]
    assert a == b


def test_sharded_multi_scan_prunes_unreachable():
    """Mesh path mirrors MultiScanner's pruning: unreachable-threshold
    motifs pack into no group and contribute no hits; an all-
    unreachable set scans to empty without dispatching anything."""
    import numpy as np

    from lightmotif_tpu import CountMatrix, EncodedSequence
    from lightmotif_tpu.ops import kernels
    from lightmotif_tpu.parallel import make_genome_mesh
    from lightmotif_tpu.parallel.mesh import ShardedMultiScanner
    from lightmotif_tpu.scanner import Scanner

    rng = np.random.default_rng(33)
    motifs = []
    for width in (8, 14):
        sites = [
            "".join("ACTG"[j] for j in rng.integers(0, 4, size=width))
            for _ in range(5)
        ]
        cm = CountMatrix.from_sequences(
            EncodedSequence.encode(s) for s in sites)
        motifs.append(cm.to_freq(0.1).to_weight(None).to_scoring())
    genome = rng.integers(0, 4, size=60_000, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))

    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        mesh = make_genome_mesh()
        sm = ShardedMultiScanner(motifs, thresholds=[-6.0, 1e9],
                                 mesh=mesh)
        assert len(sm._groups) == 1 and sm._groups[0]["ids"].tolist() \
            == [0]
        got = [(h.motif, h.position, h.score)
               for h in sm.scan(genome)]
        want = sorted((0, h.position, h.score)
                      for h in Scanner(motifs[0], seq, threshold=-6.0))
        assert got == want and got
        empty = ShardedMultiScanner(motifs, thresholds=[1e9, 1e9],
                                    mesh=mesh)
        assert not empty._groups and not empty._dense
        assert empty.scan(genome) == []

        # single_bucket (the CLI's one-program mode): identical hits,
        # one shared m_bucket across groups
        sb = ShardedMultiScanner(motifs, thresholds=[-6.0, -6.0],
                                 mesh=mesh, single_bucket=True)
        assert len({g["m_bucket"] for g in sb._groups}) == 1
        got_sb = [(h.motif, h.position, h.score)
                  for h in sb.scan(genome)]
        want_sb = sorted(
            (i, h.position, h.score) for i, p in enumerate(motifs)
            for h in Scanner(p, seq, threshold=-6.0))
        assert got_sb == want_sb and got_sb
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()


def test_halo_unit_clamps_block_for_long_motifs():
    """Regression: the shard-body kernel block must shrink with motif
    length exactly like the single-chip default (score_f32's
    _auto_block) -- the production TPU geometry (65536 lanes) overflows
    the kernel's scoped-VMEM budget past m~64."""
    from lightmotif_tpu.ops import kernels
    from lightmotif_tpu.parallel.mesh import _halo_unit

    # the production TPU unit (preferred_pad() there), explicit so the
    # test checks the same arithmetic on the CPU suite
    unit, _, bl = _halo_unit(65, kernels.PAD_LANES)
    assert bl == min(unit // kernels.CHUNKS, kernels._auto_block(65))
    assert bl < unit // kernels.CHUNKS  # the clamp actually engaged
    # small interpret-mode units are never inflated by the clamp
    assert _halo_unit(15, 64)[2] == 64 // kernels.CHUNKS


def test_sharded_dense_owns_true_window_count(monkeypatch):
    """Regression: the dense path's shard ownership (chunk) must come
    from the TRUE motif length.  Sizing it from the 32-bucketed length
    silently dropped the last ``m_b - m_i`` window starts whenever the
    per-shard rounding slack was smaller (tightest on small meshes):
    m_i=33 buckets to m_b=64, so a 127-symbol sequence has 95 true
    window starts but only 64 bucket-derived ones."""
    import numpy as np

    from lightmotif_tpu import CountMatrix, EncodedSequence
    from lightmotif_tpu.ops import kernels
    from lightmotif_tpu.parallel import make_genome_mesh, sharded_multi_scan
    from lightmotif_tpu.scanner import MultiScanner

    monkeypatch.setattr(MultiScanner, "DENSE_M_LIMIT", 16)

    rng = np.random.default_rng(5)
    sites = ["".join("ACTG"[j] for j in rng.integers(0, 4, size=33))
             for _ in range(5)]
    cm = CountMatrix.from_sequences(
        EncodedSequence.encode(s) for s in sites)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()

    genome = rng.integers(0, 4, size=127, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    threshold = float(np.min(np.asarray(pssm.score_host(seq)))) - 1.0

    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        mesh1 = make_genome_mesh(jax.devices()[:1])
        hits = sharded_multi_scan(
            [pssm], genome, [threshold], mesh=mesh1, pad_unit=64)
        single = MultiScanner([pssm], seq, [threshold]).collect()
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
    assert len(hits) == 127 - 33 + 1  # every true window start
    a = [(h.motif, h.position, h.score) for h in hits]
    b = [(h.motif, h.position, h.score) for h in single]
    assert a == b


def test_sharded_multi_scan_database_scale(monkeypatch):
    """Whole-database semantics on the mesh: the motif set splits into
    length-sorted groups (GROUP_MOTIFS monkeypatched small) and motifs
    past the dense split (DENSE_M_LIMIT overridden down to 64 -- the
    default geometric limit would need an m > 128 motif, slow in
    interpret mode) take the exact dense path, matching
    ``MultiScanner``."""
    import numpy as np

    from lightmotif_tpu import CountMatrix, EncodedSequence
    from lightmotif_tpu.ops import kernels
    from lightmotif_tpu.parallel import make_genome_mesh, sharded_multi_scan
    from lightmotif_tpu.parallel import mesh as mesh_mod
    from lightmotif_tpu.scanner import MultiScanner

    monkeypatch.setattr(MultiScanner, "GROUP_MOTIFS", 2)
    monkeypatch.setattr(MultiScanner, "DENSE_M_LIMIT", 64)

    rng = np.random.default_rng(77)

    def motif_of(width):
        sites = [
            "".join("ACTG"[j] for j in rng.integers(0, 4, size=width))
            for _ in range(5)
        ]
        cm = CountMatrix.from_sequences(
            EncodedSequence.encode(s) for s in sites)
        return cm.to_freq(0.1).to_weight(None).to_scoring()

    # 5 fused motifs -> 3 groups of 2; one long motif -> dense path
    motifs = [motif_of(w) for w in (16, 6, 11, 8, 14)]
    long_pssm = motif_of(70)
    motifs.append(long_pssm)
    genome = rng.integers(0, 4, size=50_000, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))

    # a data-dependent long-motif threshold that keeps ~40 hits
    long_scores = np.asarray(long_pssm.score_host(seq))
    thresholds = [-6.0] * 5 + [float(np.partition(long_scores, -40)[-40])]

    group_calls, dense_calls = [], []
    real_multi = mesh_mod._sharded_multi_impl
    real_dense = mesh_mod._sharded_dense_impl

    def spy_multi(*a, **k):
        group_calls.append(a[5:])
        return real_multi(*a, **k)

    def spy_dense(*a, **k):
        dense_calls.append(a[3:])
        return real_dense(*a, **k)

    monkeypatch.setattr(mesh_mod, "_sharded_multi_impl", spy_multi)
    monkeypatch.setattr(mesh_mod, "_sharded_dense_impl", spy_dense)

    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        mesh = make_genome_mesh()
        hits = sharded_multi_scan(
            motifs, genome, thresholds, mesh=mesh, pad_unit=1024)
        single = MultiScanner(motifs, seq, thresholds).collect()
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
    assert len(group_calls) >= 3, "motif-group batching did not engage"
    assert dense_calls, "long motif did not take the dense path"
    a = [(h.motif, h.position, h.score) for h in hits]
    b = [(h.motif, h.position, h.score) for h in single]
    assert a == b
    assert {h.motif for h in hits} == set(range(6))


def test_sharded_dense_bucket_shares_one_compile(monkeypatch):
    """Mesh counterpart of the single-chip dense-bucket rule: two long
    motifs whose lengths share a 32-row bucket (and hence a shard
    geometry) run ONE compiled sharded dense program -- n_i is a
    traced arg of _sharded_dense_impl, not a static."""
    import numpy as np

    from lightmotif_tpu import CountMatrix, EncodedSequence
    from lightmotif_tpu.ops import kernels
    from lightmotif_tpu.parallel import make_genome_mesh, sharded_multi_scan
    from lightmotif_tpu.parallel.mesh import _sharded_dense_impl
    from lightmotif_tpu.scanner import MultiScanner

    monkeypatch.setattr(MultiScanner, "DENSE_M_LIMIT", 16)

    rng = np.random.default_rng(11)
    pssms = []
    for m in (33, 38, 64):  # all bucket to m_b = 64
        sites = ["".join("ACTG"[j] for j in rng.integers(0, 4, size=m))
                 for _ in range(4)]
        pssms.append(CountMatrix.from_sequences(
            EncodedSequence.encode(s) for s in sites
        ).to_freq(0.1).to_weight(None).to_scoring())
    genome = rng.integers(0, 4, size=777, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    hosts = [np.asarray(p.score_host(seq)) for p in pssms]
    ths = [float(h.min()) - 1.0 for h in hosts]  # keep every window

    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        before = _sharded_dense_impl._cache_size()
        mesh2 = make_genome_mesh(jax.devices()[:2])
        hits = sharded_multi_scan(
            pssms, genome, ths, mesh=mesh2, pad_unit=64,
            cap=2048)
        assert _sharded_dense_impl._cache_size() == before + 1
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
    for i, host in enumerate(hosts):
        got = [(h.position, h.score) for h in hits if h.motif == i]
        assert got == [(p, float(np.float32(s)))
                       for p, s in enumerate(host)]


def test_sharded_multi_scanner_reuses_packed_db(monkeypatch):
    """ShardedMultiScanner packs the motif DB once and scans many
    genomes: per-genome results equal fresh sharded_multi_scan calls,
    the packed group device arrays are reused across binds, and the
    capacity ratchet is sticky."""
    import numpy as np

    from lightmotif_tpu import CountMatrix, EncodedSequence
    from lightmotif_tpu.ops import kernels
    from lightmotif_tpu.parallel import (
        ShardedMultiScanner, make_genome_mesh, sharded_multi_scan)
    from lightmotif_tpu.scanner import MultiScanner

    monkeypatch.setattr(MultiScanner, "DENSE_M_LIMIT", 16)
    rng = np.random.default_rng(21)
    pssms = []
    for m in (8, 10, 33):  # fused, fused, dense routes
        sites = ["".join("ACTG"[j] for j in rng.integers(0, 4, size=m))
                 for _ in range(4)]
        pssms.append(CountMatrix.from_sequences(
            EncodedSequence.encode(s) for s in sites
        ).to_freq(0.1).to_weight(None).to_scoring())
    ths = [-5.0, -5.0, float(np.float32(-1e30))]

    kernels.INTERPRET = True
    jax.clear_caches()
    try:
        mesh2 = make_genome_mesh(jax.devices()[:2])
        sc = ShardedMultiScanner(pssms, thresholds=ths, mesh=mesh2,
                                 pad_unit=64, cap=64)
        packed_before = [g["pssm"] for g in sc._groups] + [
            d["pssm"] for d in sc._dense]
        for seed in (1, 2):
            genome = np.random.default_rng(seed).integers(
                0, 4, size=500, dtype=np.int8)
            got = [(h.motif, h.position, h.score)
                   for h in sc.scan(genome)]
            want = [(h.motif, h.position, h.score)
                    for h in sharded_multi_scan(
                        pssms, genome, ths, mesh=mesh2, pad_unit=64,
                        cap=64)]
            assert got == want and want
        packed_after = [g["pssm"] for g in sc._groups] + [
            d["pssm"] for d in sc._dense]
        assert all(a is b for a, b in zip(packed_before, packed_after))
        # the -1e30 dense threshold keeps every window: cap=64 must
        # have ratcheted, and the ratchet survives binds
        key = ("dense", 2)
        assert sc._group_state[key][0] > 64
    finally:
        kernels.INTERPRET = False
        jax.clear_caches()
