"""Selector block: learned mixing of two signal branches.

Equivalent of reference custom_layers_selector.py:81-310. From a selector
signal it computes a per-position (LOCAL/MULTISCALE/MIXED) or per-channel
(GLOBAL) mixing mask m ∈ [0,1] biased towards input_1 (m = σ(2.5 − s),
s ≥ 0), and returns m·input_1 + (1−m)·input_2.
"""

from enum import Enum
from typing import Any, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops.normalize import (
    global_normalization, local_normalization, lowpass_filter, highpass_filter)
from ..ops.resize import avg_pool_same, resize_bilinear
from .activations import hard_sigmoid, activation_fn
from .conv import ConvBlock, DenseBlock


class ScaleType(Enum):
    LOCAL = 0
    GLOBAL = 1
    MIXED = 2
    MULTISCALE = 3

    @staticmethod
    def from_string(s) -> "ScaleType":
        if isinstance(s, ScaleType):
            return s
        return ScaleType[s.strip().upper()]


class ActivationType(Enum):
    SOFT = 0   # sigmoid
    HARD = 1   # hard_sigmoid

    @staticmethod
    def from_string(s) -> "ActivationType":
        if isinstance(s, ActivationType):
            return s
        return ActivationType[s.strip().upper()]


class SelectorBlock(nn.Module):
    scale_type: Any = ScaleType.LOCAL
    activation_type: Any = ActivationType.HARD
    filters_compress_ratio: float = 0.25
    kernel_regularizer: Any = "l1"
    kernel_initializer: Any = "glorot_normal"
    pool_size: Tuple[int, int] = (32, 32)
    use_conv1x1_selector: bool = False
    use_local_normalization: bool = False
    use_global_normalization: bool = False
    use_lowpass: bool = False
    use_highpass: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, input_1: jnp.ndarray, input_2: jnp.ndarray,
                 selector: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        scale_type = ScaleType.from_string(self.scale_type)
        act_type = ActivationType.from_string(self.activation_type)
        filters_target = input_1.shape[-1]
        filters_compress = max(1, int(round(filters_target *
                                            self.filters_compress_ratio)))
        pool = tuple(int(p) for p in self.pool_size)
        strides = (max(1, pool[0] // 4), max(1, pool[1] // 4))

        conv_common = dict(
            kernel_size=1, use_bias=False,
            kernel_regularizer=self.kernel_regularizer,
            kernel_initializer=self.kernel_initializer, dtype=self.dtype)

        x = selector
        if self.use_conv1x1_selector:
            x = ConvBlock(features=filters_target, **conv_common,
                          name="selector_1x1")(x, train=train)
        if self.use_global_normalization:
            x = global_normalization(x)
        if self.use_local_normalization:
            x = local_normalization(x, pool_size=pool)
        if self.use_lowpass:
            x = lowpass_filter(x, a=4.0, b=4.0)
        if self.use_highpass:
            x = highpass_filter(x, a=4.0, b=4.0)

        h, w = input_1.shape[1], input_1.shape[2]

        def compress_expand(y, name):
            y = ConvBlock(features=filters_compress, activation="leaky_relu",
                          **conv_common, name=f"{name}_c0")(y, train=train)
            y = ConvBlock(features=filters_target, activation="relu",
                          **conv_common, name=f"{name}_c1")(y, train=train)
            return y

        if scale_type == ScaleType.LOCAL:
            y = avg_pool_same(x, pool, strides)
            y = compress_expand(y, "local")
            y = resize_bilinear(y, (h, w))
        elif scale_type == ScaleType.MULTISCALE:
            ys = [avg_pool_same(x, (max(1, pool[0] // 2), max(1, pool[1] // 2)), strides),
                  avg_pool_same(x, pool, strides),
                  avg_pool_same(x, (pool[0] * 2, pool[1] * 2), strides)]
            y = jnp.concatenate(ys, axis=-1)
            y = compress_expand(y, "multiscale")
            y = resize_bilinear(y, (h, w))
        elif scale_type == ScaleType.MIXED:
            y_local = avg_pool_same(x, pool, strides)
            y_global = jnp.broadcast_to(
                jnp.mean(x, axis=(1, 2), keepdims=True), y_local.shape)
            y = jnp.concatenate([y_local, y_global], axis=-1)
            y = compress_expand(y, "mixed")
            y = resize_bilinear(y, (h, w))
        elif scale_type == ScaleType.GLOBAL:
            y = jnp.mean(x, axis=(1, 2))
            y = DenseBlock(features=filters_compress, activation="leaky_relu",
                           kernel_regularizer=self.kernel_regularizer,
                           kernel_initializer=self.kernel_initializer,
                           dtype=self.dtype, name="global_d0")(y, train=train)
            y = DenseBlock(features=filters_target, activation="relu",
                           kernel_regularizer=self.kernel_regularizer,
                           kernel_initializer=self.kernel_initializer,
                           dtype=self.dtype, name="global_d1")(y, train=train)
            y = y[:, None, None, :]
        else:
            raise ValueError(f"unknown scale_type [{scale_type}]")

        # y ≥ 0 after relu; bias the mask towards input_1
        y = 2.5 - y
        mask = (jnp.clip(0.2 * y + 0.5, 0.0, 1.0)
                if act_type == ActivationType.HARD else
                activation_fn("sigmoid")(y))
        return input_1 * mask + input_2 * (1.0 - mask)
