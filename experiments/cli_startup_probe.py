"""CLI warm-start floor decomposition over >= 5 runs (VERDICT #9).

Builds a small 4-record FASTA + 1-motif jaspar16 file, runs the CLI
once cold (fresh compile cache) and then 5x warm, and tabulates the
cli_timing split: imports (incl. the sitecustomize-forced jax import),
device/tunnel handshake, motif prep (repo-owned), and first-flight
time (cached-program load + first upload).
"""
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = "/root/repo"


def main():
    rng = np.random.default_rng(5)
    d = tempfile.mkdtemp()
    mot = os.path.join(d, "m.jaspar16")
    with open(mot, "w") as fh:
        fh.write(">m1 probe\n")
        for sym, row in zip("ACGT", np.eye(4, dtype=int) * 2):
            fh.write(f"{sym} [ " + " ".join(
                str(v) for v in np.tile(row, 3)[:12]) + " ]\n")
    fa = os.path.join(d, "in.fa")
    lut = np.frombuffer(b"ACGT", dtype="S1")
    with open(fa, "w") as fh:
        for i in range(4):
            body = b"".join(lut[rng.integers(0, 4, size=250_000)]).decode()
            fh.write(f">r{i}\n{body}\n")
    out = os.path.join(d, "hits.tsv")
    env = dict(os.environ)
    env["LIGHTMOTIF_TPU_COMPILE_CACHE"] = os.path.join(d, "xla-cache")
    cmd = [sys.executable, "-m", "lightmotif_tpu.cli", "-m", mot,
           "--format", "jaspar16", "-s", fa, "-o", out, "-q",
           "--abs-threshold", "8"]
    rows = []
    for run in range(6):
        t0 = time.perf_counter()
        proc = subprocess.run(cmd, env=env, cwd=REPO,
                              stderr=subprocess.PIPE, text=True)
        wall = time.perf_counter() - t0
        assert proc.returncode == 0, proc.stderr[-1500:]
        ev = {}
        for line in proc.stderr.splitlines():
            if '"event": "cli_timing"' in line:
                ev = json.loads(line)
        tag = "cold" if run == 0 else f"warm{run}"
        rows.append((tag, wall, ev))
        print(f"{tag:6s} wall={wall:6.2f}s imports={ev.get('imports_s')}"
              f" device_init={ev.get('device_init_s')}"
              f" prep={ev.get('prep_s')} first_flight={ev.get('startup_s')}"
              f" steady={ev.get('steady_s')}", flush=True)
    warm = rows[1:]
    med = lambda k: float(np.median([r[2].get(k) or 0.0 for r in warm]))
    wmed = float(np.median([r[1] for r in warm]))
    repo_owned = med("prep_s")
    print(f"\nwarm medians over {len(warm)} runs: wall {wmed:.2f}s = "
          f"imports {med('imports_s'):.2f} + device_init "
          f"{med('device_init_s'):.2f} + prep {repo_owned:.2f} + "
          f"first-flight {med('startup_s'):.2f} (cache load + upload) + "
          f"steady {med('steady_s'):.2f}", flush=True)
    print(f"repo-owned share (motif prep): {repo_owned:.2f}s", flush=True)


if __name__ == "__main__":
    main()
