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


# one tiny any-size resnet hydra config shared across test files (the
# single source — tests exercising "the tiny model" must mean the SAME
# model); copy before mutating
TINY_RESNET_MODEL = {
    "backbone": {
        "type": "resnet", "input_shape": ["?", "?", 3], "filters": 4,
        "no_layers": 1, "kernel_size": 3, "block_kernels": [3],
        "block_filters": [4], "activation": "relu", "batchnorm": False,
        "value_range": [0, 255], "kernel_regularizer": "l1",
        "kernel_initializer": "glorot_normal"},
    "denoiser": {"use_bias": False, "output_channels": 3},
}


def tiny_resnet_hydra():
    """(hydra, variables) of the shared tiny model, init at 16²."""
    import copy
    import jax.numpy as jnp
    from blind_image_denoising_tpu.models.hydra import model_builder
    hydra = model_builder(copy.deepcopy(TINY_RESNET_MODEL)).hydra
    variables = hydra.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 16, 16, 3)), train=False)
    variables = {k: v for k, v in variables.items()
                 if k in ("params", "batch_stats")}
    return hydra, variables
