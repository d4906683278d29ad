"""Test configuration: force a virtual 8-device CPU platform so sharding
tests run without TPU hardware, deterministically and fast.

Note: the axon TPU plugin in this image overrides JAX_PLATFORMS, so we must
use jax.config.update (the env vars alone are not sufficient)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
