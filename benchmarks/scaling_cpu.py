#!/usr/bin/env python
"""Scaling measurements on the virtual CPU mesh (VERDICT task 5).

No multi-chip hardware is attached, so true scaling curves cannot be
produced here.  What CAN be measured honestly:

* **mesh-of-1 overhead on the real TPU** -- ``benchmarks/run.py -k
  meshone`` (shard_map + collectives vs the plain single-chip path);
* **work conservation under sharding** (this script, CPU mesh): ONE
  fixed genome scanned on N in {1, 2, 4, 8} virtual devices sharing a
  single host core.  The core serializes the shards, so if sharding
  adds no redundant compute the wall time stays ~flat across N; growth
  with N would reveal replicated work or collective blowup;
* **halo overhead** (this script): redundant positions scored per shard
  = (m - 1) / chunk, measured from the actual shard geometry.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/scaling_cpu.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= 8, "need 8 virtual devices (XLA_FLAGS)"

    from lightmotif_tpu import CountMatrix, EncodedSequence
    from lightmotif_tpu.parallel import mesh as pmesh

    patterns = ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"]
    cm = CountMatrix.from_sequences(
        EncodedSequence.encode(p) for p in patterns)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    m = len(pssm)
    t = pssm.score_distribution().score(1e-5)

    dm = pssm.to_discrete()
    pssm_data = np.asarray(pssm.data, np.float32)
    dm_data = np.asarray(dm.data, np.uint8)
    t_scaled = int(dm.scale(t))

    rng = np.random.default_rng(0xECC011)
    n_total = 1 << 21  # ONE fixed genome; total work identical for all N
    genome = rng.integers(0, 4, size=n_total, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    host = pssm.score_host(seq)
    want = np.nonzero(host >= t)[0].tolist()

    results = []
    for n_dev in (1, 2, 4, 8):
        mesh = pmesh.make_genome_mesh(jax.devices()[:n_dev])
        args = (pssm_data, dm_data, genome, t, t_scaled)
        for _ in range(2):  # compile + settle compaction mode
            positions, scores = pmesh.sharded_scan(*args, mesh=mesh)
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            pmesh.sharded_scan(*args, mesh=mesh)
            best = min(best, time.perf_counter() - t0)
        got = sorted(int(p) for p in positions)
        assert got == want, f"parity failed at n_dev={n_dev}"
        results.append({"n_dev": n_dev, "wall_s": round(best, 3)})
        print(json.dumps(results[-1]), flush=True)

    base = results[0]["wall_s"]
    chunk1 = -(-max(n_total - m + 1, 1) // 8)
    chunk8 = max(-(-chunk1 // pmesh.xla_ops.PAD_MULTIPLE)
                 * pmesh.xla_ops.PAD_MULTIPLE, pmesh.xla_ops.PAD_MULTIPLE)
    print(json.dumps({
        "summary": "work conservation: one genome, 1..8 shards, 1 core",
        "genome_positions": n_total,
        "hits": len(want),
        "wall_ratio_vs_1dev": [round(r["wall_s"] / base, 2)
                               for r in results],
        "ideal": 1.0,
        "halo_fraction_per_shard_8way": (m - 1) / chunk8,
        "note": "flat ratios == sharding adds no redundant compute; "
                "on real chips each shard runs concurrently on its own "
                "device, so scan time scales as 1/N at this efficiency",
    }, indent=1))


if __name__ == "__main__":
    main()
