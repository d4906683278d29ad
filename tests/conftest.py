"""Force the CPU backend with a virtual 8-device mesh for the test suite.

The tunneled single-TPU environment registers a plugin that overrides the
default platform even when JAX_PLATFORMS=cpu is set, so select the backend
explicitly. Sharding tests use the 8 virtual host devices.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
