"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
paths can be exercised without TPU hardware (the driver benches on a
real chip separately).

Note: the environment may pre-import jax with a TPU platform selected
(via sitecustomize), so plain ``JAX_PLATFORMS`` env vars are too late --
we must go through ``jax.config``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # pragma: no cover - older jax reads XLA_FLAGS instead
    pass

assert jax.device_count() == 8, jax.devices()
