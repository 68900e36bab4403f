"""Test harness configuration.

The whole suite runs on CPU with 8 virtual XLA devices so that multi-chip
sharding paths (DP over a Mesh, spatial halo exchange) are exercised
without TPU hardware — the JAX-native analog of the reference forcing
CUDA_VISIBLE_DEVICES=-1 (reference tests/conftest.py:3-4).

Note: the environment's TPU plugin prepends itself to jax_platforms and
ignores the JAX_PLATFORMS env var, so the platform is forced through
jax.config before any device initialization.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
