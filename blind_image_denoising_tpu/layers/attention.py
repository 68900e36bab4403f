"""Attention layers.

* :class:`AdditiveAttentionGate` — UNet skip-connection gate
  (reference custom_layers.py:588-833).
* :class:`ConvolutionalSelfAttention` — bottleneck self-attention pinned to a
  fixed 16×16 resolution so its cost is independent of image size
  (reference custom_layers.py:1205-1379). At 16×16 the QKᵀ score matrix is
  256×256 — a single small MXU matmul.
* :class:`NonLocalAttention` — the functional Non-Local-Nets block
  (reference backbone_blocks.py:408-483).
* :func:`logit_norm` — logit normalization (reference backbone_blocks.py:33-46).
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..constants import (
    DEFAULT_BN_EPSILON, DEFAULT_BN_MOMENTUM, DEFAULT_EPSILON,
    DEFAULT_LN_EPSILON)
from ..ops.resize import resize_bilinear
from .conv import ConvBlock
from .norm import FastLayerNorm
from .convnext import soft_ortho_spec
from .multipliers import ChannelLearnableMultiplier


def logit_norm(x: jnp.ndarray, t: float = 1.0, axis: int = -1) -> jnp.ndarray:
    """L2-normalize logits (Mitigating Neural Network Overconfidence with
    Logit Normalization; reference backbone_blocks.py:33-46)."""
    denom = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True)
                     + DEFAULT_EPSILON) + DEFAULT_EPSILON
    return x / (denom * t)


def _pick_regularizer(use_soft_orthogonal: bool, use_soft_orthonormal: bool):
    if use_soft_orthogonal and use_soft_orthonormal:
        raise ValueError("soft orthogonal and orthonormal regularization "
                         "are mutually exclusive")
    if use_soft_orthogonal:
        return soft_ortho_spec(orthonormal=False)
    if use_soft_orthonormal:
        return soft_ortho_spec(orthonormal=True)
    return {"type": "l2", "config": {"l2": 1e-4}}


class AdditiveAttentionGate(nn.Module):
    """Gates an encoder skip with an additive attention mask computed from
    the (encoder, upsampled-decoder) pair: mask = sigmoid(4·scale(conv(
    leaky_relu(conv(enc) + conv(up))))), output = enc ⊙ mask."""
    attention_channels: int
    use_bias: bool = False
    use_bn: bool = False
    use_ln: bool = False
    use_soft_orthogonal_regularization: bool = False
    use_soft_orthonormal_regularization: bool = False
    kernel_initializer: Any = "glorot_normal"
    dtype: Any = None

    @nn.compact
    def __call__(self, encoder_feature: jnp.ndarray,
                 upsample_signal: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        if self.use_bn and self.use_ln:
            raise ValueError("use_bn and use_ln are mutually exclusive")
        reg = _pick_regularizer(self.use_soft_orthogonal_regularization,
                                self.use_soft_orthonormal_regularization)

        def norm(v, name):
            # normalize BEFORE the 1×1 conv (reference call order,
            # custom_layers.py:805-821)
            if self.use_bn:
                v = nn.BatchNorm(use_running_average=not train,
                                 momentum=DEFAULT_BN_MOMENTUM,
                                 epsilon=DEFAULT_BN_EPSILON,
                                 use_bias=self.use_bias,
                                 dtype=self.dtype, name=f"bn_{name}")(v)
            if self.use_ln:
                v = FastLayerNorm(epsilon=DEFAULT_LN_EPSILON,
                                  use_bias=self.use_bias,
                                  dtype=self.dtype, name=f"ln_{name}")(v)
            return v

        y = norm(encoder_feature, "y")
        y = ConvBlock(features=self.attention_channels, kernel_size=1,
                      use_bias=self.use_bias, kernel_regularizer=reg,
                      kernel_initializer=self.kernel_initializer,
                      dtype=self.dtype, name="conv_y")(y, train=train)

        x = norm(upsample_signal, "x")
        x = ConvBlock(features=self.attention_channels, kernel_size=1,
                      use_bias=self.use_bias, kernel_regularizer=reg,
                      kernel_initializer=self.kernel_initializer,
                      dtype=self.dtype, name="conv_x")(x, train=train)

        o = jax.nn.leaky_relu(x + y, 0.1)
        o = ConvBlock(features=encoder_feature.shape[-1], kernel_size=1,
                      use_bias=self.use_bias, kernel_regularizer=reg,
                      kernel_initializer=self.kernel_initializer,
                      dtype=self.dtype, name="conv_o")(o, train=train)
        o = ChannelLearnableMultiplier(name="scale_o")(o)
        mask = jax.nn.sigmoid(4.0 * o)
        return encoder_feature * mask


class ConvolutionalSelfAttention(nn.Module):
    """Resolution-pinned dot-product self-attention.

    The input is bilinearly resized to ``attention_resolution`` (16×16),
    attended there, resized back, and mixed with a 1×1 output conv + gamma.
    Cost is O(r⁴) in the fixed resolution r — constant w.r.t. image size —
    which is what lets any-size inference keep a global receptive field.
    """
    attention_channels: int
    use_bias: bool = False
    use_bn: bool = False
    use_ln: bool = False
    bn_center: bool = False
    use_gamma: bool = True
    attention_activation: str = "leaky_relu"
    output_activation: str = "linear"
    use_soft_orthonormal_regularization: bool = False
    use_soft_orthogonal_regularization: bool = False
    dropout_rate: float = 0.0
    attention_resolution: Tuple[int, int] = (16, 16)
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = inputs.shape
        rh, rw = self.attention_resolution
        reg = _pick_regularizer(self.use_soft_orthogonal_regularization,
                                self.use_soft_orthonormal_regularization)

        x = resize_bilinear(inputs, (rh, rw))

        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=DEFAULT_BN_MOMENTUM,
                             epsilon=DEFAULT_BN_EPSILON,
                             use_bias=self.bn_center,
                             dtype=self.dtype, name="bn")(x)
        if self.use_ln:
            x = FastLayerNorm(epsilon=DEFAULT_LN_EPSILON,
                              use_bias=self.bn_center,
                              dtype=self.dtype, name="ln")(x)

        def qkv(name):
            return ConvBlock(
                features=self.attention_channels, kernel_size=1,
                use_bias=self.use_bias, activation=self.attention_activation,
                kernel_regularizer=reg, dtype=self.dtype,
                name=name)(x, train=train).reshape(b, rh * rw, self.attention_channels)

        q, k, v = qkv("query_conv"), qkv("key_conv"), qkv("value_conv")

        # dot-product attention, softmax over keys (Keras Attention
        # score_mode="dot", use_scale=False)
        scores = jnp.einsum("bqc,bkc->bqk", q, k)
        weights = jax.nn.softmax(scores, axis=-1)
        if self.dropout_rate > 0.0:
            weights = nn.Dropout(rate=self.dropout_rate,
                                 deterministic=not train,
                                 name="attn_dropout")(weights)
        attended = jnp.einsum("bqk,bkc->bqc", weights, v)
        attended = attended.reshape(b, rh, rw, self.attention_channels)

        y = resize_bilinear(attended, (h, w))
        y = ConvBlock(features=c, kernel_size=1, use_bias=self.use_bias,
                      activation=self.output_activation, kernel_regularizer=reg,
                      dtype=self.dtype, name="output_conv")(y, train=train)
        if self.use_gamma:
            y = ChannelLearnableMultiplier(name="gamma")(y)
        return y


class NonLocalAttention(nn.Module):
    """Full-resolution Non-Local-Nets self-attention block
    (reference backbone_blocks.py:408-483). O((H·W)²) — use only on small
    feature maps; ConvolutionalSelfAttention is the any-size variant."""
    attention_channels: int
    use_bias: bool = False
    use_logit_norm: bool = False
    activation: str = "linear"
    kernel_regularizer: Any = "l2"
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, _ = inputs.shape
        ca = self.attention_channels

        def proj(name):
            return ConvBlock(
                features=ca, kernel_size=1, use_bias=self.use_bias,
                kernel_regularizer=self.kernel_regularizer,
                dtype=self.dtype, name=name)(inputs, train=train
                                             ).reshape(b, h * w, ca)

        theta, phi, g = proj("theta"), proj("phi"), proj("g")

        scores = jnp.einsum("bqc,bkc->bqk", theta, phi)
        if self.use_logit_norm:
            scores = logit_norm(scores, axis=-1)
        weights = jax.nn.softmax(scores, axis=-1)
        y = jnp.einsum("bqk,bkc->bqc", weights, g).reshape(b, h, w, ca)

        return ConvBlock(
            features=ca, kernel_size=1, use_bias=self.use_bias,
            activation=self.activation,
            kernel_regularizer=self.kernel_regularizer,
            dtype=self.dtype, name="out")(y, train=train)
