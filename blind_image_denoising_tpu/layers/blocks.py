"""Residual block stacks.

:class:`ResnetBlocks` is the workhorse residual stack — equivalent of
reference backbone_blocks.py:74-246 (resnet_blocks_full) including its
convnext mode (bn off + LN after first conv, backbone_blocks.py:51-68),
dense gating, learnable multipliers, RandomOnOff branch dropout, and
selector-mixed skips.

All convs stay NHWC/SAME/stride-1 → XLA tiles them on the MXU and fuses the
elementwise tail (gate multiply, residual add, activation) into the conv
epilogues; the whole stack compiles to one fusion chain per block.
"""

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from .activations import Activation
from .conv import ConvBlock, DenseBlock, conv_block_from_params
from .multipliers import ChannelwiseMultiplier, Multiplier
from .norm import FastLayerNorm
from .selector import SelectorBlock
from .stochastic import RandomOnOff
from ..ops.normalize import local_normalization
from ..constants import (
    DEFAULT_CHANNELWISE_MULTIPLIER_L1,
    DEFAULT_LN_EPSILON,
    DEFAULT_MULTIPLIER_L1,
)


class DenseGate(nn.Module):
    """Channel gate: global mean → dense(max(c/8,2), relu) → dense(c,
    hard_sigmoid) → per-channel multiply
    (reference backbone_blocks.py:136-162,199-208)."""
    gate_filters: int
    dtype: Any = None

    @nn.compact
    def __call__(self, gate_signal: jnp.ndarray, x: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        y = jnp.mean(gate_signal, axis=(1, 2))
        y = DenseBlock(features=max(self.gate_filters // 8, 2),
                       use_bias=False, activation="relu",
                       kernel_regularizer="l2", dtype=self.dtype,
                       name="gate_dense_0")(y, train=train)
        y = DenseBlock(features=self.gate_filters, use_bias=False,
                       activation="hard_sigmoid", kernel_regularizer="l2",
                       dtype=self.dtype, name="gate_dense_1")(y, train=train)
        return x * y[:, None, None, :]


class ResnetBlocks(nn.Module):
    """A stack of ``no_layers`` residual blocks of up to 3 convs each."""
    no_layers: int
    first_conv_params: Optional[Dict] = None
    second_conv_params: Optional[Dict] = None
    third_conv_params: Optional[Dict] = None
    use_bn: bool = False                 # BN after 2nd/3rd convs
    bn_center: bool = False
    bn_bias_free: bool = False           # strict bias-free BN variant
    bn_first_conv: bool = False          # BN also after 1st conv
    ln_after_first_conv: bool = False    # convnext mode
    use_gate: bool = False
    dropout_rate: float = 0.0            # RandomOnOff on the residual branch
    use_multiplier: bool = False
    use_channelwise: bool = False
    selector_params: Optional[Dict] = None
    post_addition_activation: Optional[str] = None
    # Local mean/sigma normalization of each block's residual-branch input
    # (avg-pool window). The reference threads mean_sigma_params
    # {'pool_size': (11, 11)} into resnet_blocks_full but its snapshot never
    # applies it (backbone_blocks.py:127 assigns use_mean_sigma, nothing
    # reads it) — we implement the documented intent ("add variance for each
    # block", backbone_resnet.py:78) with the reference's own
    # local_normalization op (utilities.py:581-596).
    mean_sigma_pool: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.no_layers < 0:
            raise ValueError("no_layers must be >= 0")

        gate_filters = 0
        if self.use_gate:
            if self.second_conv_params and "filters" in self.second_conv_params:
                gate_filters = self.second_conv_params["filters"]
            elif (self.second_conv_params
                  and "depth_multiplier" in self.second_conv_params
                  and self.first_conv_params):
                gate_filters = (self.first_conv_params["filters"]
                                * self.second_conv_params["depth_multiplier"])
            else:
                raise ValueError("cannot infer gate filters")

        for i in range(self.no_layers):
            previous = x
            x_first = None

            if self.mean_sigma_pool is not None:
                x = local_normalization(
                    x, pool_size=(self.mean_sigma_pool, self.mean_sigma_pool))

            if self.first_conv_params is not None:
                x = conv_block_from_params(
                    self.first_conv_params, f"block_{i}_conv_1",
                    use_bn=self.use_bn and self.bn_first_conv,
                    bn_center=self.bn_center,
                    bn_bias_free=self.bn_bias_free,
                    dtype=self.dtype)(x, train=train)
                x_first = x

            if self.ln_after_first_conv:
                x = FastLayerNorm(use_bias=False, use_scale=True,
                                  epsilon=DEFAULT_LN_EPSILON,
                                  dtype=self.dtype,
                                  name=f"block_{i}_ln")(x)
                x_first = x

            gate_signal = x_first

            if self.second_conv_params is not None:
                x = conv_block_from_params(
                    self.second_conv_params, f"block_{i}_conv_2",
                    use_bn=self.use_bn, bn_center=self.bn_center,
                    bn_bias_free=self.bn_bias_free,
                    dtype=self.dtype)(x, train=train)
                gate_signal = x

            if self.use_gate:
                x = DenseGate(gate_filters, dtype=self.dtype,
                              name=f"block_{i}_gate")(gate_signal, x, train=train)

            if self.third_conv_params is not None:
                x = conv_block_from_params(
                    self.third_conv_params, f"block_{i}_conv_3",
                    use_bn=self.use_bn, bn_center=self.bn_center,
                    bn_bias_free=self.bn_bias_free,
                    dtype=self.dtype)(x, train=train)

            if self.use_channelwise:
                x = ChannelwiseMultiplier(
                    multiplier=1.0, activation="relu",
                    l1_coefficient=DEFAULT_CHANNELWISE_MULTIPLIER_L1,
                    name=f"block_{i}_channelwise")(x)
            if self.use_multiplier:
                x = Multiplier(
                    multiplier=1.0, activation="relu",
                    l1_coefficient=DEFAULT_MULTIPLIER_L1,
                    name=f"block_{i}_multiplier")(x)
            if self.dropout_rate > 0.0:
                x = RandomOnOff(rate=self.dropout_rate,
                                name=f"block_{i}_onoff")(x, train=train)

            if self.selector_params is not None:
                if x_first is None:
                    raise ValueError("selector requires a first conv output")
                x = SelectorBlock(dtype=self.dtype,
                                  name=f"block_{i}_selector",
                                  **self.selector_params)(
                    previous, x, x_first, train=train)
            else:
                x = x + previous

            if self.post_addition_activation:
                x = Activation(self.post_addition_activation,
                               name=f"block_{i}_post_act")(x)
        return x
