"""Head-fetch payload probe 2: steady-state A/B of head shapes.

Probe 1 (headfetch_probe.py) showed isolated re-fetches of the SAME
device buffer are served from a tunnel-side cache (0.0 ms) — useless.
The honest measurement re-dispatches the fused program every trial
(fresh buffers) and times dispatch + device_get of each candidate head
shape end-to-end, interleaved A/B/C blocks like segsplit_probe.

Variants (the host-rescore variant is dead on arrival: 50.7 ms host
for 71,730 hits vs <=35 ms of transfer saved):
  base   — shipped [3, 131072] i32 head (1.57 MB)
  w125   — finer ladder [3, 81920] i32 (0.98 MB)
  u16    — finer + motif row as u16 (pos i32 / mot u16 / score i32,
           0.82 MB)

Run: python experiments/headfetch_probe2.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from lightmotif_tpu import EncodedSequence, load
    from lightmotif_tpu.scanner import MultiScanner

    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    db = "/root/reference/lightmotif-io/benches/JASPAR2024.meme"
    fwd = [mo.pssm for mo in load(db, format="meme")
           if mo.pssm is not None]
    ths = [p.score_distribution().score(1e-6) for p in fwd]
    pssms = fwd + [p.reverse_complement() for p in fwd]
    ms = MultiScanner(pssms, thresholds=ths + ths)

    ids0, _, _ = ms.scan_arrays(seq)
    ms.scan_arrays(seq)
    n_hits = len(ids0)
    print(f"hits={n_hits}", flush=True)

    def heads_base(packed):
        return (packed[:, :131072],)

    def heads_w125(packed):
        return (packed[:, :81920],)

    def heads_u16(packed):
        return (packed[0, :81920], packed[1, :81920].astype(jnp.uint16),
                packed[2, :81920])

    variants = [("base", heads_base), ("w125", heads_w125),
                ("u16", heads_u16)]

    def trial(mk_heads):
        t0 = time.perf_counter()
        token = ms._dispatch_raw()
        e = token["entries"][0]
        got = jax.device_get((e["counts"],) + mk_heads(e["packed"]))
        n_kept = int(got[0][2])
        assert n_kept == n_hits, n_kept
        return time.perf_counter() - t0

    # warm each variant's fetch program once
    for _, mk in variants:
        trial(mk)

    walls = {name: [] for name, _ in variants}
    for _ in range(3):
        for name, mk in variants:
            block = [trial(mk) for _ in range(4)]
            walls[name].extend(block[1:])  # first pays variant switch
    for name, _ in variants:
        w = sorted(walls[name])
        print(f"{name}: best={w[0]:.4f} median={w[len(w) // 2]:.4f} "
              f"all={[round(x, 3) for x in w]}", flush=True)


if __name__ == "__main__":
    main()
