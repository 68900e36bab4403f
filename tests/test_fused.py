"""Fused int8 serving path (inference/fused.py): config guard, float-path
equivalence vs the linen hydra forward, calibration, int8-path quality.
Pallas runs in interpret mode on the CPU suite."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blind_image_denoising_tpu.models.hydra import model_builder
from blind_image_denoising_tpu.inference.fused import (
    build_fused_forward, calibrate_fused, supports_fused)

TINY_FLAGSHIP = {
    "backbone": {
        "type": "unet_laplacian",
        "input_shape": ["?", "?", 3],
        "depth": 3, "width": 2, "filters": 8,
        "encoder_kernel_size": 5, "decoder_kernel_size": 5,
        "activation": "leaky_relu_01",
        "upsample_type": "upsample_nearest_conv2d",
        "downsample_type": "conv2d",
        "use_bn": False, "use_ln": True, "use_bias": False,
        "use_concat": False, "use_gamma": True,
        "use_mix_project": False,
        "use_self_attention": True,
        "use_attention_gates": False,
        "use_output_normalization": True,
        "use_soft_orthonormal_regularization": True,
        "multiple_scale_outputs": True,
        "depth_drop_rate": 0.5,
        "convolutional_self_attention_dropout_rate": 0.25,
        "kernel_regularizer": "l2",
        "kernel_initializer": "glorot_normal",
        "gaussian_kernel_size": 2,
        "use_laplacian_averaging": True,
        "use_complex_base": False,
    },
    "denoiser": {"filters": 8, "use_bn": False, "use_ln": False,
                 "use_bias": False, "activation": "leaky_relu_01",
                 "output_channels": 3, "kernel_regularizer": "l2",
                 "kernel_initializer": "glorot_normal"},
}


@pytest.fixture(scope="module")
def flagship():
    results = model_builder(TINY_FLAGSHIP)
    hydra = results.hydra
    variables = hydra.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    variables = {k: v for k, v in variables.items()
                 if k in ("params", "batch_stats")}
    return hydra, variables


def test_supports_fused_guards():
    assert supports_fused(TINY_FLAGSHIP["backbone"])
    bad = dict(TINY_FLAGSHIP["backbone"], use_concat=True)
    assert not supports_fused(bad)
    bad = dict(TINY_FLAGSHIP["backbone"], type="resnet")
    assert not supports_fused(bad)
    with pytest.raises(ValueError, match="supported"):
        build_fused_forward({"backbone": bad,
                             "denoiser": TINY_FLAGSHIP["denoiser"]}, {})
    # the denoiser-head subset is guarded too: _head implements only
    # leaky_relu_01/linear with no BN/LN/bias — anything else must raise,
    # not silently drop the option
    for bad_head in (dict(TINY_FLAGSHIP["denoiser"], activation="relu"),
                     dict(TINY_FLAGSHIP["denoiser"], use_ln=True),
                     dict(TINY_FLAGSHIP["denoiser"], use_bias=True)):
        with pytest.raises(ValueError, match="denoiser-head"):
            build_fused_forward({"backbone": TINY_FLAGSHIP["backbone"],
                                 "denoiser": bad_head}, {})


def test_fused_float_matches_hydra(flagship):
    """Float-I/O fused forward must reproduce hydra.apply: every scale,
    gray-level tolerance (the fused kernels compute matmuls in bf16)."""
    hydra, variables = flagship
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (1, 64, 64, 3))
        .astype(np.float32))
    ref = hydra.apply(variables, x, train=False)

    fwd, sites = build_fused_forward(
        TINY_FLAGSHIP, variables, scales=None, dtype=jnp.float32,
        interpret=True)
    got = fwd(x)
    assert len(got) == len(ref) == 3
    for i, (g, r) in enumerate(zip(got, ref)):
        assert g.shape == r.shape
        diff = jnp.abs(g.astype(jnp.float32) - r.astype(jnp.float32))
        # per-stage wiring is matmul-exact (every intermediate matches the
        # flax capture within ~0.005); the pointwise budget here is bf16
        # matmul noise compounded over ~10 stages then amplified by the
        # head's tanh slope x value-range denormalization (x260)
        mean_err = float(diff.mean())
        assert mean_err < 1.0, f"scale {i}: mean err {mean_err} gray levels"
        assert float(diff.max()) < 25.0, f"scale {i}: max {float(diff.max())}"


def test_fused_int8_calibrated_quality(flagship):
    """Calibrate on noisy samples, run the int8 path: output within a few
    gray levels of the float forward (the QUANTIZATION.md fidelity
    class), and the scales cover every site."""
    hydra, variables = flagship
    rng = np.random.default_rng(1)
    base = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    noisy = np.clip(base + rng.normal(0, 40, base.shape), 0, 255)
    scales = calibrate_fused(TINY_FLAGSHIP, variables,
                             np.concatenate([base, noisy]), interpret=True)
    fwd_q, sites = build_fused_forward(
        TINY_FLAGSHIP, variables, scales=scales, dtype=jnp.float32,
        interpret=True)
    assert set(sites) <= set(scales)

    x = jnp.asarray(base[:1])
    ref = hydra.apply(variables, x, train=False)[0]
    got = fwd_q(x)[0]
    err = float(jnp.abs(got.astype(jnp.float32)
                        - ref.astype(jnp.float32)).mean())
    assert err < 4.0, f"int8 fused mean err {err} gray levels"
