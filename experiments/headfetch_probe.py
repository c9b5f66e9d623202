"""Head-fetch payload probe: how much of the jasparfull steady wall is
the counters+head transfer, and what do three shrink levers buy?

The steady scan fetches ``packed[:, :width]`` — [3, width] int32 —
where ``width = head_width(hint=71730, cap_hits)`` = 131072 slots =
1.57 MB.  At the tunnel's measured 15–38 MB/s that is 41–105 ms of a
153 ms wall.  Levers, cheapest risk first:

  A. finer ladder: snap the width to 1.25x over the hint instead of 8x
     (71730 -> 90112) — pure transfer reduction, a few extra tiny
     slice programs on hint drift;
  B. u16 motif row: motif lane ids < 2048 (group-local) fit u16 —
     row 1 transfers half;
  C. drop the score row, recompute exact f32 host-side from
     (pos, motif) in the mandated ascending-j order (bit parity
     asserted here) — saves 4 bytes/slot, pays host time.

This probe measures (1) the live scanner's actual cap/cap_hits/width/
n_kept, (2) isolated device_get walls for each candidate head shape,
(3) the host exact-rescore cost + bit parity, (4) steady scan_arrays
walls as shipped.  Decision threshold: a lever ships only if the
isolated numbers predict >=10 ms and the parity gate passes.

Run: python experiments/headfetch_probe.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def bestof(fn, n=7, settle=1):
    walls = []
    for i in range(n + settle):
        t0 = time.perf_counter()
        fn()
        w = time.perf_counter() - t0
        if i >= settle:
            walls.append(w)
    walls.sort()
    return walls


def main():
    import jax
    import jax.numpy as jnp

    from lightmotif_tpu import EncodedSequence, load
    from lightmotif_tpu.scanner import MultiScanner, head_width

    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    db = "/root/reference/lightmotif-io/benches/JASPAR2024.meme"
    fwd = [mo.pssm for mo in load(db, format="meme")
           if mo.pssm is not None]
    ths = [p.score_distribution().score(1e-6) for p in fwd]
    pssms = fwd + [p.reverse_complement() for p in fwd]
    ms = MultiScanner(pssms, thresholds=ths + ths)

    ids0, pos0, sc0 = ms.scan_arrays(seq)
    ms.scan_arrays(seq)  # settle sticky ratchets + head hints
    n_hits = len(ids0)
    print(f"hits={n_hits}", flush=True)
    for key, (cap, cap_hits, dense) in ms._group_state.items():
        hint = ms._head_hint.get(key, 0)
        w = head_width(hint, cap_hits)
        print(f"group {key}: cap={cap} cap_hits={cap_hits} "
              f"dense={dense} hint={hint} head_width={w} "
              f"head_bytes={3 * w * 4}", flush=True)

    # ---- baseline steady wall ----
    walls = bestof(lambda: ms.scan_arrays(seq), n=9)
    print(f"steady wall: best={walls[0]:.4f} "
          f"median={walls[len(walls) // 2]:.4f} "
          f"all={[round(x, 3) for x in walls]}", flush=True)

    # ---- isolated transfer walls for candidate head shapes ----
    token = ms._dispatch_raw()
    e = token["entries"][0]
    packed = e["packed"]  # [3, cap_hits] i32
    cap_hits = int(packed.shape[1])
    counts = e["counts"]

    def t_fetch(arrs, label, n=7):
        jax.device_get(arrs)  # warm (compiles the slice programs)
        walls = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.device_get(arrs)
            walls.append(time.perf_counter() - t0)
        walls.sort()
        nbytes = sum(np.prod(a.shape) * a.dtype.itemsize
                     for a in jax.tree_util.tree_leaves(arrs))
        print(f"{label}: {nbytes / 1e6:.2f} MB best={walls[0] * 1e3:.1f} ms "
              f"median={walls[len(walls) // 2] * 1e3:.1f} ms "
              f"-> {nbytes / 1e6 / walls[0]:.0f} MB/s", flush=True)
        return walls[0]

    w8x = head_width(n_hits, cap_hits)          # shipped ladder
    w125 = min(cap_hits, -(-n_hits * 5 // 4) // 8192 * 8192)  # 1.25x snap
    t_fetch((counts, packed[:, :w8x]), f"shipped head [3,{w8x}] i32")
    t_fetch((counts, packed[:, :w125]), f"finer ladder [3,{w125}] i32")
    t_fetch((counts, packed[0, :w125], packed[1, :w125].astype(jnp.uint16),
             packed[2, :w125]), f"finer + u16 motif [{w125}]")
    t_fetch((counts, packed[0, :w125],
             packed[1, :w125].astype(jnp.uint16)),
            f"finer + u16 motif + NO score row [{w125}]")
    t_fetch((counts,), "counters only (RTT floor)")

    # ---- host exact rescore: cost + bit parity ----
    pssm_stack = ms.pssm_stack  # [M, m_pad, K] f32 (host np)
    lengths = ms.lengths
    gh = np.ascontiguousarray(genome.astype(np.uint8))

    def host_rescore(pos, mot):
        m_pad = pssm_stack.shape[1]
        acc = np.zeros(len(pos), np.float32)
        mlen = lengths[mot]
        for j in range(int(mlen.max())):
            sym = gh[np.minimum(pos + j, len(gh) - 1)]
            t = pssm_stack[mot, j, sym]
            acc = np.where(j < mlen, acc + t, acc).astype(np.float32)
        return acc

    t0 = time.perf_counter()
    sc_host = host_rescore(pos0, ids0)
    t_host = time.perf_counter() - t0
    exact = np.array_equal(sc_host, sc0)
    print(f"host exact rescore: {t_host * 1e3:.1f} ms for {n_hits} hits "
          f"bit_parity={exact}", flush=True)
    if not exact:
        bad = np.flatnonzero(sc_host != sc0)[:5]
        print("  MISMATCH at", bad, sc_host[bad], sc0[bad], flush=True)


if __name__ == "__main__":
    main()
