"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere
(the standard JAX fake-mesh trick).

The dev image's sitecustomize force-registers a tunneled-TPU PJRT backend and
overrides JAX_PLATFORMS, so env vars alone are not enough — we must also set
the config after import (backends initialize lazily, so this still wins)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
