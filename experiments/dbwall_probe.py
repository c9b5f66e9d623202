"""Decompose the whole-database (jasparfull) steady-state wall.

Stages timed on host walls (the only trustworthy clock on the tunnel):
  dispatch   = MultiScanner._dispatch_raw (async queueing, host packing)
  counters   = jax.device_get of counters+heads (device compute + 1 RTT)
  fetch_rest = remaining per-entry packed fetch + host settle
  host_tail  = concat/sort to (motif, position) order
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from lightmotif_tpu import EncodedSequence, load
    from lightmotif_tpu.scanner import MultiScanner

    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=4_641_652, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))

    db = "/root/reference/lightmotif-io/benches/JASPAR2024.meme"
    fwd = [mo.pssm for mo in load(db, format="meme") if mo.pssm is not None]
    ths = [p.score_distribution().score(1e-6) for p in fwd]
    pssms = fwd + [p.reverse_complement() for p in fwd]
    ms = MultiScanner(pssms, thresholds=ths + ths)
    ids, _, _ = ms.scan_arrays(seq)  # warm
    print(f"hits={len(ids)}", flush=True)

    for rep in range(4):
        t0 = time.perf_counter()
        token = ms._dispatch_raw()
        t1 = time.perf_counter()
        entries = token["entries"]
        batch = jax.device_get([(e["counts"], e["head"]) for e in entries])
        t2 = time.perf_counter()
        # now run the full fetch path (device results cached; the
        # device_get above re-transfers inside _fetch_raw, so time a
        # fresh full scan separately for the total)
        out = ms._fetch_raw(token)
        t3 = time.perf_counter()
        counts = [np.asarray(c).tolist() for c, _ in batch]
        print(f"rep{rep}: dispatch={t1-t0:.4f} counters={t2-t1:.4f} "
              f"fetch_full={t3-t2:.4f} entries={len(entries)} "
              f"counts={counts}", flush=True)

    best = np.inf
    for _ in range(4):
        t0 = time.perf_counter()
        ms.scan_arrays(seq)
        best = min(best, time.perf_counter() - t0)
    print(f"full steady wall: {best:.4f} s", flush=True)

    # how much is the final hit-array transfer? fetch head-only by
    # repeating the device_get of the packed slice
    e = token["entries"][0]
    n = 71730
    t0 = time.perf_counter()
    jax.device_get(e["packed"][:, :n])
    t1 = time.perf_counter()
    print(f"packed[:, :{n}] fetch: {t1-t0:.4f} s", flush=True)


if __name__ == "__main__":
    main()
