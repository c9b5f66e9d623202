"""Where does CLI steady-state time go? Measure, on the real chip:
device_put of an 8 MB flight, the fused multi-scan dispatch+fetch,
and a packed-2bit upload alternative."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 8 << 20
rng = np.random.default_rng(0)
flight = rng.integers(0, 4, size=N, dtype=np.int8)

def t(label, fn, reps=5):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:40s} {best*1e3:8.1f} ms")
    return best

# 1. raw upload 8 MB int8
def up():
    d = jax.device_put(flight)
    d.block_until_ready()
t("device_put 8MB int8", up)

# 2. upload 2 MB (packed 4:1)
packed = np.zeros(N // 4, np.uint8)
def up2():
    d = jax.device_put(packed)
    d.block_until_ready()
t("device_put 2MB u8 (4:1 packed)", up2)

# 3. tiny fetch round trip
d8 = jax.device_put(flight)
d8.block_until_ready()
small = jnp.sum(d8.astype(jnp.int32))
def rtt():
    jax.device_get(small)
t("device_get scalar (RTT floor)", rtt)

# 4. fused multi-scan of a resident flight (M=1, m=12): dispatch+fetch
from lightmotif_tpu import CountMatrix, EncodedSequence
from lightmotif_tpu.scanner import MultiScanner
cm = CountMatrix.from_sequences(
    EncodedSequence.encode(p) for p in ["ACGTACGTACGT", "ACGAACGTACGT"])
pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
seq = EncodedSequence(rng.integers(0, 4, size=N, dtype=np.uint8))
ms = MultiScanner([pssm], thresholds=2.0)
ms.scan_arrays(seq)  # warm
def scan_again():
    ms.bind(EncodedSequence(np.asarray(seq.data)))  # new object: re-upload
    ms.collect_arrays()
t("rebind (re-upload) + scan 8MB", scan_again, 3)
def scan_cached():
    ms.bind(seq)
    ms.collect_arrays()
t("cached-bind scan 8MB (no upload)", scan_cached, 3)

# 5. unpack cost on device: 2-bit unpack then sum
dp = jax.device_put(packed)
dp.block_until_ready()
@jax.jit
def unpack(p):
    x = p.astype(jnp.int32)
    parts = [(x >> (2 * i)) & 3 for i in range(4)]
    return jnp.stack(parts, 1).reshape(-1).astype(jnp.int8)
u = unpack(dp); u.block_until_ready()
def up3():
    d = jax.device_put(packed)
    out = unpack(d)
    out.block_until_ready()
t("packed upload + device unpack", up3)
