"""Decompose the mesh-of-1 sharded scan's overhead vs the plain
Scanner (VERDICT r3 weak #3: 0.249 s vs 0.185 s = 1.35x).

Phases timed separately over repeated runs:
  plain total      -- Scanner(pssm, seq, t).collect() fresh each time
  plain rebind     -- persistent Scanner, rebind + collect
  mesh shard (host)-- shard_sequence numpy work
  mesh upload      -- _put_sharded device_put
  mesh impl+fetch  -- _sharded_scan_impl + the one-RTT counters+head
  mesh total       -- ShardedScanner(...).collect() fresh each time
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from lightmotif_tpu import CountMatrix, EncodedSequence
from lightmotif_tpu.parallel import mesh as pm
from lightmotif_tpu.scanner import Scanner

PATTERNS = ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"]


def main():
    cm = CountMatrix.from_sequences(
        EncodedSequence.encode(p) for p in PATTERNS)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    t = pssm.score_distribution().score(1e-5)
    dm = pssm.to_discrete()
    ts = dm.scale(t)

    def rep(label, fn, n=5):
        fn()  # warm
        best = np.inf
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:24s}: {best*1e3:8.1f} ms", flush=True)
        return best

    rep("plain fresh", lambda: Scanner(pssm, seq, threshold=t).collect())

    mesh = pm.make_genome_mesh()
    m = len(pssm)
    wc = pssm.alphabet.size - 1
    unit, halo, block_lanes = pm._halo_unit(m, None)

    def do_shard():
        return pm.shard_sequence(genome, mesh.devices.size, m, wc,
                                 pad_multiple=unit, halo=halo)
    rep("mesh shard (host)", do_shard)
    shards, chunk, n_scores = do_shard()
    rep("mesh upload", lambda: pm._put_sharded(shards, mesh))
    shards_dev = pm._put_sharded(shards, mesh)
    dmd = jnp.asarray(np.asarray(dm.data))
    psd = jnp.asarray(np.asarray(pssm.data, np.float32))

    def impl():
        counts, packed = pm._sharded_scan_impl(
            shards_dev, dmd, psd, jnp.int32(ts), jnp.float32(t),
            chunk, n_scores, 1 << 16, pm._MeshHolder(mesh), False,
            block_lanes)
        head = packed[:, :, : min(1 << 16, pm._HEAD_SLOTS)]
        counts, head_h = jax.device_get((counts, head))
        return counts
    rep("mesh impl+fetch", impl)
    rep("mesh sharded_scan", lambda: pm.sharded_scan(
        np.asarray(pssm.data, np.float32), np.asarray(dm.data),
        genome, t, ts, mesh=mesh))

    from lightmotif_tpu.parallel import ShardedScanner
    rep("mesh fresh total", lambda: ShardedScanner(
        pssm, seq, threshold=t).collect())


if __name__ == "__main__":
    main()
