"""Fused int8 ConvNext-block kernel (ops/pallas_convnext.py): layout
helpers, float-path equivalence vs the linen block math, and int8-path
quantization error bounds. Runs in Pallas interpret mode on the CPU
suite; the honest TPU timings live in docs/QUANTIZATION.md."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blind_image_denoising_tpu.ops.pallas_convnext import (
    block_weights_from_params,
    convnext_block_reference,
    from_cf_padded,
    fused_convnext_block,
    quantize_cf,
    to_cf_padded,
)


def _rand_weights(C, E, K=5, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        dw_w=jnp.asarray(rng.normal(0, 0.1, (C, K * K)), jnp.float32),
        ln_scale=jnp.asarray(rng.uniform(0.5, 1.5, (C, 1)), jnp.float32),
        w2=jnp.asarray(rng.normal(0, 0.2, (E, C)), jnp.float32),
        w3=jnp.asarray(rng.normal(0, 0.2, (C, E)), jnp.float32),
        gamma_gain=jnp.asarray(rng.uniform(0.3, 0.9, (C, 1)), jnp.float32),
    )


def test_cf_padded_round_trip():
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 8, 128, 32)),
                    jnp.float32)
    cf = to_cf_padded(x, pad=2)
    assert cf.shape == (2, 32, 12 * 128)
    grid = cf.reshape(2, 32, 12, 128)
    # pad rows are zero
    assert float(jnp.abs(grid[:, :, :2]).max()) == 0.0
    assert float(jnp.abs(grid[:, :, -2:]).max()) == 0.0
    back = from_cf_padded(cf, H=8, W=128, pad=2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("HW", [(16, 128), (8, 256)])
def test_fused_block_float_matches_reference(HW):
    H, W = HW
    C, E = 32, 128
    weights = _rand_weights(C, E)
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1.0, (2, H, W, C)),
                    jnp.float32)
    ref = convnext_block_reference(x, weights)

    got_cf = fused_convnext_block(
        to_cf_padded(x, pad=2), **weights, H=H, W=W, pad=2,
        rows=H // 2, interpret=True)
    got = from_cf_padded(got_cf, H=H, W=W, pad=2)
    # kernel computes the matmuls in bf16 (MXU path) — tolerance is bf16
    # resolution on O(1) activations
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=0.05)


def test_fused_block_matches_linen_convnext():
    """End-to-end parity against the actual linen ConvNextBlock with
    flagship options (depthwise 5x5 -> FastLayerNorm -> 1x1 x4 expand
    leaky_relu(0.1) -> 1x1 project -> gamma -> +skip)."""
    from blind_image_denoising_tpu.layers.convnext import ConvNextBlock

    C, E, H, W = 32, 128, 8, 128
    common = dict(strides=(1, 1), padding="same", use_bias=False)
    block = ConvNextBlock(
        conv_params_1=dict(kernel_size=5, depth_multiplier=1,
                           activation="linear", **common),
        conv_params_2=dict(kernel_size=1, filters=E,
                           activation="leaky_relu_01", **common),
        conv_params_3=dict(kernel_size=1, filters=C,
                           activation="linear", **common),
        use_bn=False, use_ln=True, use_gamma=True)
    x = jnp.asarray(np.random.default_rng(2).normal(0, 1.0, (1, H, W, C)),
                    jnp.float32)
    variables = block.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    skip = x + block.apply(
        {"params": variables["params"]}, x, train=False)

    weights = block_weights_from_params(variables["params"])
    got_cf = fused_convnext_block(
        to_cf_padded(x, pad=2), **weights, H=H, W=W, pad=2,
        rows=H // 2, interpret=True)
    got = from_cf_padded(got_cf, H=H, W=W, pad=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(skip),
                               rtol=0, atol=0.05)


def test_fused_block_int8_quantization_error_bounded():
    """int8 I/O mode: output matches the float reference within the
    quantization step of the output scale (all arithmetic inside is
    float — only the I/O is quantized)."""
    C, E, H, W = 32, 128, 8, 128
    weights = _rand_weights(C, E, seed=3)
    x = jnp.asarray(np.random.default_rng(4).normal(0, 1.0, (1, H, W, C)),
                    jnp.float32)
    ref = np.asarray(convnext_block_reference(x, weights))

    s_in = float(np.abs(np.asarray(x)).max() / 127.0)
    s_out = float(np.abs(ref).max() / 127.0)
    xq = quantize_cf(to_cf_padded(x, pad=2), s_in)
    got_q = fused_convnext_block(
        xq, **weights, H=H, W=W, pad=2, scale_in=s_in, scale_out=s_out,
        rows=H // 2, interpret=True)
    assert got_q.dtype == jnp.int8
    got = from_cf_padded(got_q.astype(jnp.float32) * s_out, H=H, W=W, pad=2)
    # error budget: input quantization propagated through the block plus
    # one output quantization step
    tol = 3.0 * max(s_in, s_out)
    assert float(np.abs(np.asarray(got) - ref).max()) < tol


def test_fused_block_pad_rows_rezeroed():
    """Edge grid steps must re-zero the output pad rows (the next
    block's halo correctness depends on it)."""
    C, E, H, W = 32, 128, 8, 128
    weights = _rand_weights(C, E, seed=5)
    x = jnp.asarray(np.random.default_rng(6).normal(0, 1.0, (1, H, W, C)),
                    jnp.float32)
    out = fused_convnext_block(
        to_cf_padded(x, pad=2), **weights, H=H, W=W, pad=2,
        rows=H // 2, interpret=True)
    grid = out.reshape(1, C, H + 4, W)
    assert float(jnp.abs(grid[:, :, :2]).max()) == 0.0
    assert float(jnp.abs(grid[:, :, H + 2:]).max()) == 0.0
