#!/usr/bin/env python
"""Headline benchmark: full-genome PSSM scan on one TPU chip.

Workload parity with the reference benchmark
(``lightmotif/benches/score.rs``, ``README.md:104-109``): score every
position of an E. coli K12-sized genome (4,641,652 bp) with the
PRODORIC MX000001 motif (15x5 PSSM, 0.1 pseudocount, uniform
background), writing the f32 score of every window to device memory --
the same work the reference's AVX2 backend does at 1029 MB/s ~= 1.029e9
positions/s on one i7-10710U core (``BASELINE.md``).

Correctness gates before any timing:

* **full-genome bit parity**: all 4,641,638 device scores must equal
  the sequential host oracle exactly (``np.array_equal``);
* **known-answer anchor** (content-dependent, the analogue of the
  reference's position-391677 check on the real E. coli genome, which
  is not redistributable in this environment): the best hit of the
  deterministic seed-0xECC011 genome is position 3,254,602 with score
  f32-bits 0x4197E448 (18.986465...), where the tie rule must prefer
  it over position 2,558,379 scoring the *identical* f32 value.

The primary metric is the exact-f32 scan; ``secondary`` reports the
two-pass Scanner wall time and the fused multi-motif prefilter rate
(the reference's own genome-scale paths).  Timing uses in-jit
repetition slopes with a wide rep span (the TPU sits behind a tunnel
whose ~30 ms jitter can inflate small-span slopes 3x; the span here
puts >=150 ms of device work between the two rep counts).

Prints exactly one JSON line whose first four keys follow the driver
contract: {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

ECOLI_LENGTH = 4_641_652
BASELINE_POS_PER_S = 1.029e9  # reference AVX2, single core
PATTERNS = ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"]  # == MX000001 counts
KNOWN_BEST_POS = 3_254_602
KNOWN_BEST_BITS = 1100473416  # f32 18.986465454101562
KNOWN_TIE_POS = 2_558_379  # scores the identical f32 value


def build_inputs():
    from lightmotif_tpu import CountMatrix, EncodedSequence

    cm = CountMatrix.from_sequences(EncodedSequence.encode(p) for p in PATTERNS)
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()

    rng = np.random.default_rng(0xECC011)
    genome = rng.integers(0, 4, size=ECOLI_LENGTH, dtype=np.int8)
    seq = EncodedSequence(genome.astype(np.uint8))
    return pssm, seq


def bench_slope(fn_carry, args, probe, r_lo=32, r_hi=1024, trials=4):
    """Per-iteration device time via in-jit repetition slopes.

    See ``tools/perf.py``: the remote-TPU tunnel neither synchronizes on
    ``block_until_ready`` nor re-executes identical dispatches, so the
    benchmark loops on-device inside ``lax.fori_loop`` with a carry that
    perturbs the operands (``* 1e-45`` flushes to zero at runtime but is
    opaque to the compiler) and forces completion with a host read.  The
    fixed round-trip cancels in the slope between two repetition counts.
    """
    import jax
    import jax.numpy as jnp

    def looped(r):
        def body(_, carry):
            out = fn_carry(*args, carry)
            val = out.reshape(-1)[probe].astype(jnp.float32)
            return carry + val * jnp.float32(1e-45)

        return jax.jit(lambda: jax.lax.fori_loop(0, r, body, jnp.float32(0.0)))

    results = {}
    for r in (r_lo, r_hi):
        f = looped(r)
        float(jax.device_get(f()))
        best = np.inf
        for _ in range(trials):
            t0 = time.perf_counter()
            float(jax.device_get(f()))
            best = min(best, time.perf_counter() - t0)
        results[r] = best
    return (results[r_hi] - results[r_lo]) / (r_hi - r_lo)


def secondary_metrics(pssm, seq, genome_len):
    """Scanner wall + fused multi-motif prefilter rate (best effort)."""
    out = {}
    try:
        from lightmotif_tpu.scanner import Scanner

        t = pssm.score_distribution().score(1e-5)
        Scanner(pssm, seq, threshold=t).collect()  # warm/compile
        best = np.inf
        n_hits = 0
        for _ in range(3):
            t0 = time.perf_counter()
            n_hits = len(Scanner(pssm, seq, threshold=t).collect())
            best = min(best, time.perf_counter() - t0)
        out["scanner_p1e5_wall_s"] = round(best, 3)
        out["scanner_hits"] = n_hits
        out["scanner_pos_per_s_incl_tunnel"] = round(genome_len / best)
    except Exception as e:  # pragma: no cover - best effort
        out["scanner_error"] = repr(e)[:120]

    try:
        import jax
        import jax.numpy as jnp

        from lightmotif_tpu.ops import multi_kernel

        rng = np.random.default_rng(11)
        m, k, M = 15, 5, 1024
        dms = rng.integers(0, 200, size=(M, m, k)).astype(np.float32)
        dms[:, :, 4] = 0.0
        filters_t = multi_kernel.pack_filters_any(
            dms, np.full(M, 2400, np.int64), k)
        # keep the experiment's finite thresholds (pack maps >255 to
        # the never-pass guard; 2400 is realistic for raw integer sums)
        filters_t[multi_kernel._lanes_for(k) - 1, :] = -2400.0
        tile = multi_kernel.TILE
        lp = -(-genome_len // tile) * tile
        flat = np.full(lp, 4, np.int8)
        flat[:genome_len] = np.asarray(seq.data, np.int8)[:genome_len]
        sdev = jax.device_put(flat)
        fdev = jax.device_put(filters_t)
        fn = lambda s, f, carry: multi_kernel.prefilter_any(
            s, f + carry, m, k)
        jax.device_get(fn(sdev, fdev, jnp.float32(0.0)))
        per = bench_slope(fn, (sdev, fdev), probe=100, r_lo=4, r_hi=64,
                          trials=3)
        out["multi_prefilter_gpos_motif_per_s"] = round(
            genome_len * M / per / 1e9, 1)
        out["multi_prefilter_vs_avx2_per_motif"] = round(
            genome_len * M / per / BASELINE_POS_PER_S, 1)
    except Exception as e:  # pragma: no cover - best effort
        out["multi_error"] = repr(e)[:120]

    try:
        import os

        from lightmotif_tpu import load
        from lightmotif_tpu.scanner import MultiScanner

        db = "/root/reference/lightmotif-io/benches/JASPAR2024.meme"
        if os.path.exists(db):
            # the reference CLI's whole-database workload, end-to-end:
            # every JASPAR2024 motif x both strands x the genome, exact
            # f32 hits (main.rs:240-378); steady-state wall with the
            # packed DB + genome device-cached
            fwd = [mo.pssm for mo in load(db, format="meme")
                   if mo.pssm is not None]
            ths = [p.score_distribution().score(1e-6) for p in fwd]
            pssms = fwd + [p.reverse_complement() for p in fwd]
            ms = MultiScanner(pssms, thresholds=ths + ths)
            mo_ids, _, _ = ms.scan_arrays(seq)  # warm: pack+upload+compile
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                ms.scan_arrays(seq)
                best = min(best, time.perf_counter() - t0)
            gpm = genome_len * len(pssms) / best
            out["database_scan_wall_s"] = round(best, 3)
            out["database_scan_hits"] = int(len(mo_ids))
            out["database_scan_motifs_x_strands"] = len(pssms)
            out["database_scan_gpos_motif_per_s"] = round(gpm / 1e9, 1)
            out["database_scan_vs_avx2_whole_scan"] = round(
                gpm / BASELINE_POS_PER_S, 1)
    except Exception as e:  # pragma: no cover - best effort
        out["database_error"] = repr(e)[:120]
    return out


def wait_for_chip(max_wait_s: float = 1500, probe_timeout_s: float = 150):
    """Bounded wait for the tunneled TPU to answer a trivial dispatch.

    The axon tunnel intermittently wedges for tens of minutes (observed
    repeatedly); an in-process hung dispatch cannot be cancelled, so the
    probe runs in a subprocess with a timeout and retries until the chip
    answers or ``max_wait_s`` elapses.  Returns True when the chip is up.
    """
    import subprocess

    code = ("import jax, jax.numpy as jnp; x = jnp.ones((8, 128)); "
            "(x @ x.T).sum().block_until_ready()")
    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=probe_timeout_s,
                               capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            return False
        time.sleep(30)


def main() -> None:
    if not wait_for_chip():
        # one parseable line instead of an indefinite hang: the driver
        # records the failure rather than timing out with nothing
        print(json.dumps({
            "metric": "full-genome exact f32 scoring",
            "value": None,
            "unit": "Gpos/s",
            "vs_baseline": None,
            "error": "TPU tunnel unreachable for 25 min (wedged)",
        }))
        raise SystemExit(1)

    import jax
    import jax.numpy as jnp

    from lightmotif_tpu.ops import kernels, xla_ops
    from lightmotif_tpu.utils.cache import enable_persistent_cache

    # compile times are never inside the timed slopes; caching them
    # just makes driver re-runs cheap
    enable_persistent_cache()

    pssm, seq = build_inputs()
    dseq_pad = kernels.preferred_pad()
    m = len(pssm)
    seq_len = len(seq)
    n_scores = seq_len - m + 1
    lp = xla_ops.pad_length(seq_len, dseq_pad)
    flat = np.full(lp, pssm.alphabet.default_index, dtype=np.int8)
    flat[:seq_len] = seq.data
    sdev = jax.device_put(flat)
    pssm_dev = jnp.asarray(np.asarray(pssm.data, dtype=np.float32))

    fn = jax.jit(lambda s, p: kernels.score_f32(s, p, n_scores))

    # gate 1: FULL-genome bit parity vs the sequential host oracle
    out = jax.device_get(fn(sdev, pssm_dev))[:n_scores]
    host = pssm.score_host(seq)
    if not np.array_equal(out, host):
        bad = int(np.argmin(out == host))
        print(json.dumps({"error": "parity check failed", "at": bad}),
              file=sys.stderr)
        raise SystemExit(1)

    # gate 2: content-dependent known answer + last-max tie rule
    mx = host.max()
    am = int(np.nonzero(host == mx)[0][-1])
    if (am != KNOWN_BEST_POS
            or np.float32(mx).view(np.int32) != KNOWN_BEST_BITS
            or np.float32(host[KNOWN_TIE_POS]).view(np.int32)
            != KNOWN_BEST_BITS):
        print(json.dumps({"error": "known-answer check failed",
                          "argmax": am, "bits": int(np.float32(mx).view(np.int32))}),
              file=sys.stderr)
        raise SystemExit(1)

    t = bench_slope(
        lambda s, p, carry: kernels.score_f32(s, p + carry, n_scores),
        (sdev, pssm_dev),
        probe=n_scores - 1,
    )
    pos_per_s = n_scores / t

    print(
        json.dumps(
            {
                "metric": "genome_scan_positions_per_second_per_chip",
                "value": pos_per_s,
                "unit": "positions/s",
                "vs_baseline": pos_per_s / BASELINE_POS_PER_S,
                "secondary": secondary_metrics(pssm, seq, seq_len),
            }
        )
    )


if __name__ == "__main__":
    main()
