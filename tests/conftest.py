"""Test env: force CPU with a virtual 8-device mesh (SURVEY.md §4: multi-chip
paths are validated on a xla_force_host_platform_device_count CPU mesh).

jax is pre-imported at interpreter start by the environment's sitecustomize
(with JAX_PLATFORMS=axon), so plain env vars are too late — use
jax.config.update before any backend initialization instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
