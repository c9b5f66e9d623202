"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
paths can be exercised without TPU hardware (the driver benches on a
real chip separately).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
