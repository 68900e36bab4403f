"""Squeeze-and-Excitation.

Covers both reference variants: the functional block
(backbone_blocks.py:251-313) and the layer class with soft-orthonormal
regularized 1×1s + ChannelLearnableMultiplier (custom_layers.py:512-582).
The GAP → 1×1 → 1×1 path is tiny (per-channel vectors); XLA keeps it
entirely in registers/VMEM.
"""

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .activations import hard_sigmoid
from .conv import ConvBlock
from .convnext import soft_ortho_spec
from .multipliers import ChannelLearnableMultiplier


class SqueezeExcite(nn.Module):
    """GAP → 1×1 squeeze → LeakyReLU(0.1) → 1×1 → sigmoid gate × input."""
    r_ratio: float = 0.25
    use_bias: bool = True
    hard_sigmoid_version: bool = False
    learn_to_turn_off: bool = False
    use_soft_orthonormal_regularization: bool = False
    kernel_regularizer: Any = "l2"
    kernel_initializer: Any = "glorot_normal"
    use_scale_gamma: bool = False   # layer-class variant adds a gamma scale
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.r_ratio <= 0.0:
            raise ValueError("r_ratio should be > 0.0")
        channels = x.shape[-1]
        squeezed = max(1, int(round(channels * self.r_ratio)))
        reg = (soft_ortho_spec(orthonormal=True)
               if self.use_soft_orthonormal_regularization
               else self.kernel_regularizer)

        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = ConvBlock(features=squeezed, kernel_size=1, use_bias=self.use_bias,
                      kernel_regularizer=reg,
                      kernel_initializer=self.kernel_initializer,
                      dtype=self.dtype, name="squeeze")(y, train=train)
        y = jax.nn.leaky_relu(y, 0.1)
        y = ConvBlock(features=channels, kernel_size=1, use_bias=self.use_bias,
                      kernel_regularizer=reg,
                      kernel_initializer=self.kernel_initializer,
                      dtype=self.dtype, name="excite")(y, train=train)

        if self.hard_sigmoid_version:
            if self.learn_to_turn_off:
                # channels default-on; learns to shut them off
                y = 2.5 - jax.nn.relu(y)
            y = hard_sigmoid(y)
        else:
            y = jax.nn.sigmoid(y)

        if self.use_scale_gamma:
            y = ChannelLearnableMultiplier(name="gamma")(y)
        return x * y
