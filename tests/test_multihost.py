"""True multi-process (DCN-style) scan validation.

Launches TWO separate Python processes, each owning 4 virtual CPU
devices, joined with ``jax.distributed`` into one 8-device mesh -- the
same topology as two TPU hosts on DCN.  Each process runs
``sharded_scan`` SPMD and emits the hits of its own genome shards; the
test merges them and compares against a single-process scan.
"""

import json
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import json, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    pid = int(sys.argv[1])
    port = sys.argv[2]
    jax.distributed.initialize("localhost:" + port, num_processes=2,
                               process_id=pid)
    import numpy as np
    sys.path.insert(0, "@REPO@")
    from lightmotif_tpu import CountMatrix, EncodedSequence
    from lightmotif_tpu.parallel import make_genome_mesh, sharded_scan

    cm = CountMatrix.from_sequences(
        EncodedSequence.encode(p)
        for p in ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"])
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    dm = pssm.to_discrete()
    rng = np.random.default_rng(42)
    genome = rng.integers(0, 4, size=120_000, dtype=np.int8)
    mesh = make_genome_mesh()
    assert len(jax.devices()) == 8, jax.devices()
    positions, scores = sharded_scan(
        np.asarray(pssm.data), np.asarray(dm.data), genome,
        threshold=-5.0, t_scaled=dm.scale(-5.0), mesh=mesh)

    from lightmotif_tpu.parallel import sharded_argmax, sharded_multi_scan
    gmax, garg = sharded_argmax(np.asarray(pssm.data), genome, mesh=mesh)

    from lightmotif_tpu.ops import kernels
    kernels.INTERPRET = True
    jax.clear_caches()
    from lightmotif_tpu.parallel import mesh as mesh_mod
    from lightmotif_tpu.parallel.mesh import ShardedMultiScanner
    sms = ShardedMultiScanner(
        [pssm, pssm.reverse_complement()], thresholds=-5.0, mesh=mesh)
    mhits = sms.scan(genome[:30_000])
    # round-4 verdict item 5: on BOTH processes the steady-state fetch
    # must ride the counters round trip -- exactly ONE device_get and
    # zero full per-shard packed fallbacks
    n_get = [0]
    orig_get = jax.device_get
    jax.device_get = lambda x: (n_get.__setitem__(0, n_get[0] + 1),
                                orig_get(x))[1]
    full0 = mesh_mod._FULL_FETCHES
    mhits2 = sms.collect()
    jax.device_get = orig_get
    assert ([(h.motif, h.position, h.score) for h in mhits2]
            == [(h.motif, h.position, h.score) for h in mhits])
    head_stats = {"device_gets": n_get[0],
                  "full_fetches": mesh_mod._FULL_FETCHES - full0}

    print("RESULT" + json.dumps({
        "head_stats": head_stats,
        "pid": pid,
        "hits": [[int(p), float(s)] for p, s in zip(positions, scores)],
        "argmax": [float(gmax), int(garg)],
        "mhits": [[h.motif, h.position, float(h.score)] for h in mhits],
    }), flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_scan_matches_single():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    code = _WORKER.replace("@REPO@", repo)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers configure their own devices
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    hits = {}
    for p in procs:
        out, _ = p.communicate(timeout=420)
        assert p.returncode == 0, out[-2000:]
        for line in out.splitlines():
            if line.startswith("RESULT"):
                rec = json.loads(line[len("RESULT"):])
                hits[rec["pid"]] = rec
    assert set(hits) == {0, 1}

    # single-process oracle
    from lightmotif_tpu import CountMatrix, EncodedSequence
    from lightmotif_tpu.scanner import Scanner

    cm = CountMatrix.from_sequences(
        EncodedSequence.encode(p)
        for p in ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"])
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    rng = np.random.default_rng(42)
    genome = rng.integers(0, 4, size=120_000, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    want = sorted(
        (h.position, np.float32(h.score))
        for h in Scanner(pssm, seq, threshold=-5.0)
    )
    got = sorted(
        (int(p), np.float32(s))
        for rec in hits.values()
        for p, s in rec["hits"]
    )
    assert got == want

    # argmax replicated and correct on both processes
    host = pssm.score_host(seq)
    best = int(np.where(host == host.max())[0][-1])
    for rec in hits.values():
        assert rec["argmax"][1] == best
        assert np.float32(rec["argmax"][0]) == np.float32(host.max())

    # round-4 verdict item 5: each process's steady fetch is ONE
    # device_get (counters + per-process addressable heads together),
    # with zero full per-shard packed fallbacks
    for rec in hits.values():
        assert rec["head_stats"] == {"device_gets": 1,
                                     "full_fetches": 0}, rec["head_stats"]

    # multi-scan: the union over processes matches a single-process run
    from lightmotif_tpu.scanner import MultiScanner

    want_m = sorted(
        (h.motif, h.position, np.float32(h.score))
        for h in MultiScanner(
            [pssm, pssm.reverse_complement()],
            EncodedSequence(genome[:30_000].astype(np.uint8)),
            -5.0).collect()
    )
    got_m = sorted(
        (int(m_), int(p), np.float32(s))
        for rec in hits.values()
        for m_, p, s in rec["mhits"]
    )
    assert got_m == want_m
