"""Tunnel transfer-bandwidth probe: device_put / device_get walls for
a range of buffer sizes, to establish whether the CLI's steady state
(~38 Mbp/s with 4-bit packing = ~8 MB/flight uploads) is transfer-bound
and what 2-bit packing would buy."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev, flush=True)

# warm up the tunnel/allocator
_ = jax.device_put(np.ones(1024, np.uint8), dev).block_until_ready()

for mb in (1, 4, 8, 16, 32):
    buf = np.random.default_rng(0).integers(
        0, 255, size=mb << 20, dtype=np.uint8)
    # uploads: fresh buffer each rep so no caching
    walls = []
    for r in range(4):
        b = buf.copy()
        t0 = time.perf_counter()
        d = jax.device_put(b, dev)
        d.block_until_ready()
        walls.append(time.perf_counter() - t0)
    up = mb / min(walls)
    # downloads
    walls = []
    for r in range(4):
        t0 = time.perf_counter()
        _ = np.asarray(d)
        walls.append(time.perf_counter() - t0)
    down = mb / min(walls)
    print(f"{mb:3d} MB  up {up:7.1f} MB/s  down {down:7.1f} MB/s",
          flush=True)

# round-trip latency floor (tiny transfer)
walls = []
for r in range(20):
    t0 = time.perf_counter()
    _ = int(jax.device_put(np.int32(1), dev) + 1)
    walls.append(time.perf_counter() - t0)
print(f"tiny round trip: min {min(walls)*1e3:.1f} ms "
      f"median {sorted(walls)[len(walls)//2]*1e3:.1f} ms", flush=True)
