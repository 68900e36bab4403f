"""Layer library tests (shape, parameter count, regularizer sowing) —
mirrors reference tests/bfcnn/test_custom_layers.py patterns."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blind_image_denoising_tpu import layers as L


RNG = jax.random.PRNGKey(0)
X = jnp.ones((2, 16, 16, 8), jnp.float32)


def test_conv_block_shapes_and_losses():
    m = L.ConvBlock(features=16, kernel_size=3, activation="relu",
                    kernel_regularizer="l1", use_bn=True)
    vs = m.init({"params": RNG}, X, train=False)
    y, mut = m.apply(vs, X, train=True,
                     mutable=["batch_stats", "losses"],
                     rngs={"dropout": RNG})
    assert y.shape == (2, 16, 16, 16)
    assert jax.tree_util.tree_leaves(mut["losses"])  # penalty sown
    # inference apply needs no mutable collections
    y2 = m.apply(vs, X, train=False, mutable=False)
    assert y2.shape == y.shape


def test_conv_block_depthwise_and_groups():
    m = L.ConvBlock(kernel_size=3, depth_multiplier=4)
    vs = m.init(RNG, X)
    assert m.apply(vs, X).shape == (2, 16, 16, 32)

    m = L.ConvBlock(features=16, kernel_size=1, groups=2)
    vs = m.init(RNG, X)
    assert m.apply(vs, X).shape == (2, 16, 16, 16)
    kernel = vs["params"]["kernel"]
    assert kernel.shape == (1, 1, 4, 16)  # in/groups


def test_conv_block_transpose_upsamples():
    m = L.ConvBlock(features=8, kernel_size=2, strides=2, transpose=True)
    vs = m.init(RNG, X)
    assert m.apply(vs, X).shape == (2, 32, 32, 8)


def test_relu_bias_init():
    m = L.ConvBlock(features=4, kernel_size=1, use_bias=True,
                    activation="relu")
    vs = m.init(RNG, X)
    np.testing.assert_allclose(np.asarray(vs["params"]["bias"]), 0.1)


def test_channel_learnable_multiplier_near_identity():
    m = L.ChannelLearnableMultiplier()
    vs = m.init(RNG, X)
    y = m.apply(vs, X, mutable=["losses"])[0]
    # w ≈ 0 → gain ≈ tanh(1) ≈ 0.7616
    np.testing.assert_allclose(np.asarray(y), np.tanh(1.0), rtol=0.05)


def test_multiplier_legacy_semantics():
    # act(w0 + multiplier) with w0=0 and relu → exactly multiplier
    m = L.Multiplier(multiplier=1.0, activation="relu")
    vs = m.init(RNG, X)
    y = m.apply(vs, X)
    np.testing.assert_allclose(np.asarray(y), np.asarray(X))
    assert vs["params"]["w0"].shape == (1,)

    m = L.ChannelwiseMultiplier(multiplier=1.0, activation="relu")
    vs = m.init(RNG, X)
    assert vs["params"]["w0"].shape == (8,)


def test_stochastic_depth_drops_whole_samples():
    m = L.StochasticDepth(0.5)
    vs = m.init(RNG, X)
    y = np.asarray(m.apply(vs, X, train=True,
                           rngs={"dropout": jax.random.PRNGKey(7)}))
    per_sample = y.reshape(2, -1)
    for b in range(2):
        vals = np.unique(per_sample[b])
        assert len(vals) == 1  # whole sample either kept(scaled) or dropped
    # eval mode: identity
    np.testing.assert_allclose(
        np.asarray(m.apply(vs, X, train=False)), np.asarray(X))


def test_conv_self_attention_any_size():
    m = L.ConvolutionalSelfAttention(attention_channels=8, use_ln=True)
    vs = m.init(RNG, X)
    for hw in (16, 33, 64):
        x = jnp.ones((1, hw, hw, 8))
        vs_hw = m.init(RNG, x)
        y = m.apply(vs_hw, x, mutable=["losses"])[0]
        assert y.shape == x.shape


def test_attention_gate_masks_encoder():
    m = L.AdditiveAttentionGate(attention_channels=4)
    vs = m.init(RNG, X, X)
    y = np.asarray(m.apply(vs, X, X, mutable=["losses"])[0])
    assert y.shape == X.shape
    assert (np.abs(y) <= np.abs(np.asarray(X)) + 1e-6).all()  # sigmoid mask


def test_selector_block_mixes():
    ones, zeros = X, jnp.zeros_like(X)
    for st in ("local", "global", "mixed", "multiscale"):
        m = L.SelectorBlock(scale_type=st, pool_size=(4, 4))
        vs = m.init(RNG, ones, zeros, X)
        y = np.asarray(m.apply(vs, ones, zeros, X, mutable=["losses"])[0])
        assert y.shape == X.shape
        assert (y >= -1e-6).all() and (y <= 1.0 + 1e-6).all()


def test_squeeze_excite_gate_range():
    m = L.SqueezeExcite()
    vs = m.init(RNG, X)
    y = np.asarray(m.apply(vs, X, mutable=["losses"])[0])
    assert ((y >= 0) & (y <= np.asarray(X) + 1e-6)).all()


@pytest.mark.parametrize("kind,expected_hw", [
    ("nn", 32), ("bilinear", 32),
    ("upsample_nearest_conv2d", 32),
    ("upsample_bilinear_conv2d", 32),
    ("upsample_laplacian_conv2d", 32),
    ("conv2d_transpose", 32),
])
def test_upsample_variants(kind, expected_hw):
    m = L.Upsample(kind, dict(filters=8))
    vs = m.init(RNG, X)
    y = m.apply(vs, X, mutable=["losses"])[0]
    assert y.shape[1] == expected_hw


@pytest.mark.parametrize("kind", ["conv2d", "maxpool", "strides"])
def test_downsample_variants(kind):
    m = L.Downsample(kind, dict(filters=16))
    vs = m.init(RNG, X)
    y = m.apply(vs, X, mutable=["losses"])[0]
    assert y.shape[1] == 8


def test_upsample_laplacian_commute_equivalence():
    """Linear 1x1-conv and bilinear upsample commute
    (reference upsampling.py:74-101 speedup trick)."""
    from blind_image_denoising_tpu.ops.resize import upsample_2x_bilinear
    m = L.ConvBlock(features=8, kernel_size=1, activation="linear")
    vs = m.init(RNG, X)
    a = upsample_2x_bilinear(m.apply(vs, X))
    b = m.apply(vs, upsample_2x_bilinear(X))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_resnet_blocks_residual_identity_at_init_zero_input():
    fc = dict(kernel_size=3, filters=8, use_bias=False, activation="relu")
    sc = dict(kernel_size=3, filters=16, use_bias=False, activation="relu")
    tc = dict(kernel_size=1, filters=8, use_bias=False, activation="linear")
    m = L.ResnetBlocks(no_layers=2, first_conv_params=fc,
                       second_conv_params=sc, third_conv_params=tc)
    x = jnp.zeros((1, 8, 8, 8))
    vs = m.init(RNG, x)
    y = m.apply(vs, x)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)


def test_gated_mlp():
    m = L.GatedMLP(filters=16)
    vs = m.init(RNG, X)
    y = m.apply(vs, X)
    assert y.shape == X.shape


def test_value_compressor_bounds():
    m = L.ValueCompressor(alpha=4.0, beta=0.5)
    y = np.asarray(m.apply({}, jnp.asarray([-100.0, 0.0, 100.0])))
    np.testing.assert_allclose(y, [-0.5, 0.0, 0.5], atol=1e-4)


def test_smooth_and_global_multipliers():
    m = L.SmoothChannelLearnableMultiplier()
    vs = m.init(RNG, X)
    y = np.asarray(m.apply(vs, X, mutable=["losses"])[0])
    # sigmoid(2.5 + w) with w≈0 → gain ≈ 0.924
    np.testing.assert_allclose(y, 0.924 * np.asarray(X), rtol=0.05)

    m = L.GlobalLearnableMultiplier()
    vs = m.init(RNG, X)
    assert vs["params"]["w_multiplier"].shape == (1,)
    y = m.apply(vs, X, mutable=["losses"])[0]
    assert y.shape == X.shape


def test_non_local_attention_shapes():
    m = L.NonLocalAttention(attention_channels=4, use_logit_norm=True)
    vs = m.init(RNG, X)
    assert m.apply(vs, X, mutable=["losses"])[0].shape == (2, 16, 16, 4)


def test_logit_norm_unit_scale():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8)) * 100)
    y = np.asarray(L.logit_norm(x))
    norms = np.linalg.norm(y, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-2)


def test_fast_layer_norm_matches_flax():
    """FastLayerNorm ≡ nn.LayerNorm in f32 (tolerance: float assoc) and
    close in bf16; param names interchangeable with flax checkpoints."""
    import flax.linen as nn
    from blind_image_denoising_tpu.layers.norm import FastLayerNorm

    x = jnp.asarray(np.random.default_rng(0)
                    .normal(0, 3, (2, 8, 8, 32)).astype(np.float32))
    for use_bias in (False, True):
        ours = FastLayerNorm(epsilon=1e-6, use_scale=True, use_bias=use_bias)
        ref = nn.LayerNorm(epsilon=1e-6, use_scale=True, use_bias=use_bias)
        v_ours = ours.init(jax.random.PRNGKey(0), x)
        v_ref = ref.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(v_ours)
                == jax.tree_util.tree_structure(v_ref))
        # non-trivial params exercise the scale/bias paths
        v = jax.tree_util.tree_map(
            lambda a: a + jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
            * 0.01, v_ref)
        np.testing.assert_allclose(
            np.asarray(ours.apply(v, x)), np.asarray(ref.apply(v, x)),
            rtol=1e-5, atol=1e-5)

    # bf16: stays close to the f32 result
    ours16 = FastLayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)
    v = ours16.init(jax.random.PRNGKey(1), x)
    y16 = np.asarray(ours16.apply(v, x)).astype(np.float32)
    y32 = np.asarray(FastLayerNorm(epsilon=1e-6).apply(v, x))
    assert np.abs(y16 - y32).max() < 0.05
    assert ours16.apply(v, x).dtype == jnp.bfloat16


def test_fast_layer_norm_gradients_match_flax():
    """The custom VJP must reproduce autodiff-through-nn.LayerNorm
    gradients (x, scale AND bias cotangents) — a wrong hand-written
    backward would silently mis-train every use_ln model."""
    import flax.linen as nn
    from blind_image_denoising_tpu.layers.norm import FastLayerNorm

    x = jnp.asarray(np.random.default_rng(3)
                    .normal(0, 3, (2, 6, 6, 16)).astype(np.float32))
    for use_bias in (False, True):
        ours = FastLayerNorm(epsilon=1e-6, use_scale=True, use_bias=use_bias)
        ref = nn.LayerNorm(epsilon=1e-6, use_scale=True, use_bias=use_bias)
        v = ref.init(jax.random.PRNGKey(0), x)
        v = jax.tree_util.tree_map(
            lambda a: a + jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
            * 0.02, v)

        def loss(mod):
            # non-uniform cotangent exercises every backward term
            w = jnp.arange(x.size, dtype=jnp.float32).reshape(x.shape)
            return lambda vv, xx: jnp.sum(mod.apply(vv, xx) * jnp.sin(w))

        g_ours_v, g_ours_x = jax.grad(loss(ours), argnums=(0, 1))(v, x)
        g_ref_v, g_ref_x = jax.grad(loss(ref), argnums=(0, 1))(v, x)
        np.testing.assert_allclose(np.asarray(g_ours_x), np.asarray(g_ref_x),
                                   rtol=1e-4, atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(g_ours_v),
                        jax.tree_util.tree_leaves(g_ref_v)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


def test_conv_block_bn_keeps_bf16_compute():
    """Regression: flax BatchNorm with dtype=None promotes bf16 inputs to f32
    via its f32 params; ConvBlock must pass the resolved compute dtype so the
    bf16 chain (the HBM-bound flagship's) survives BN."""
    x16 = X.astype(jnp.bfloat16)
    m = L.ConvBlock(features=8, kernel_size=1, use_bn=True, dtype=None)
    vs = m.init({"params": RNG}, x16, train=False)
    y = m.apply(vs, x16, train=False, mutable=False)
    assert y.dtype == jnp.bfloat16


def test_prelu_keeps_bf16_compute():
    """Regression: the f32 prelu_alpha param must be cast to the activation
    dtype, or jnp.where promotes the whole downstream chain to f32."""
    from blind_image_denoising_tpu.layers.activations import Activation
    x16 = jnp.linspace(-2.0, 2.0, 32).reshape(1, 4, 8, 1).astype(jnp.bfloat16)
    m = Activation("prelu")
    vs = m.init(RNG, x16)
    y = m.apply(vs, x16)
    assert y.dtype == jnp.bfloat16
    # slope 0.1 on the negative side
    neg = x16[x16 < 0]
    np.testing.assert_allclose(np.asarray(y[x16 < 0], np.float32),
                               np.asarray(neg, np.float32) * 0.1,
                               rtol=2e-2)


def test_attention_norms_use_project_epsilon():
    """Regression: the attention layers' BN/LN must run with the project
    constants (eps 1e-3, momentum 0.995 — reference Keras defaults), not the
    flax defaults (1e-5/0.99, LN 1e-6). Checked numerically on a low-variance
    input, where eps dominates the denominator."""
    from blind_image_denoising_tpu.constants import DEFAULT_LN_EPSILON
    from blind_image_denoising_tpu.layers.attention import (
        ConvolutionalSelfAttention)
    rng = np.random.default_rng(7)
    # tiny variance: 1/sqrt(var + 1e-3) vs 1/sqrt(var + 1e-6) differ ~30x
    x = jnp.asarray(rng.normal(0.0, 1e-4, (1, 16, 16, 8)).astype(np.float32))
    m = ConvolutionalSelfAttention(attention_channels=8, use_ln=True,
                                   use_bn=False)
    vs = m.init({"params": RNG}, x, train=False)
    _, inter = m.apply(vs, x, train=False, mutable=False,
                       capture_intermediates=True)
    # locate the LN output among captured intermediates
    flat = jax.tree_util.tree_leaves_with_path(inter)
    ln_outs = [v for p, v in flat if any("ln" == getattr(k, "key", None)
                                         for k in p)]
    assert ln_outs, "LN intermediate not captured"
    ln_out = ln_outs[0]
    # manual LN with the project epsilon over the last axis
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    manual = (x - mean) / jnp.sqrt(var + DEFAULT_LN_EPSILON)
    np.testing.assert_allclose(np.asarray(ln_out), np.asarray(manual),
                               atol=1e-4)
