"""Miscellaneous layers: fixed Gaussian blur, value compression, sparsity.

Equivalents of reference custom_layers.py:133-168 (GaussianFilter),
custom_layers.py:1385-1401 (ValueCompressor) and utilities.py:366-429
(sparse_block).
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..constants import DEFAULT_BN_EPSILON, DEFAULT_BN_MOMENTUM
from ..ops.gaussian import gaussian_blur


class GaussianFilter(nn.Module):
    """Fixed (non-learnable) depthwise Gaussian blur."""
    kernel_size: Tuple[int, int] = (5, 5)
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return gaussian_blur(x, kernel_size=tuple(self.kernel_size),
                             strides=tuple(self.strides))


class ValueCompressor(nn.Module):
    """tanh(αx)·β squash."""
    alpha: float = 4.0
    beta: float = 0.5

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.tanh(x * self.alpha) * self.beta


class GatedMLP(nn.Module):
    """Gated 1×1-conv MLP: two parallel 1×1 expansions, one passed through
    a gate activation and multiplied into the other, then projected back.

    The reference's GatedMLP (custom_layers.py:37-101) references undefined
    attributes and would crash at build time (dead code, SURVEY §2.4); this
    is the working equivalent."""
    filters: int
    use_bias: bool = False
    activation: str = "linear"
    gate_activation: str = "sigmoid"
    kernel_regularizer: Any = None
    kernel_initializer: Any = "glorot_normal"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from .conv import ConvBlock
        common = dict(kernel_size=1, use_bias=self.use_bias,
                      kernel_regularizer=self.kernel_regularizer,
                      kernel_initializer=self.kernel_initializer,
                      dtype=self.dtype)
        value = ConvBlock(features=self.filters,
                          activation=self.activation,
                          **common, name="value")(x, train=train)
        gate = ConvBlock(features=self.filters,
                         activation=self.gate_activation,
                         **common, name="gate")(x, train=train)
        out = ConvBlock(features=x.shape[-1], activation="linear",
                        **common, name="project")(value * gate, train=train)
        return out


class SparseBlock(nn.Module):
    """BN-normalize then zero out values below ``threshold_sigma``; keeps the
    distribution's right tail (or |tail| when symmetrical)."""
    threshold_sigma: float = 1.0
    symmetrical: bool = False
    reverse: bool = False
    soft_sparse: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.threshold_sigma < 0:
            raise ValueError("threshold_sigma must be >= 0")
        x_bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=DEFAULT_BN_MOMENTUM,
            epsilon=DEFAULT_BN_EPSILON,
            use_bias=False, use_scale=True, name="bn")(x)
        if self.symmetrical:
            x_bn = jnp.abs(x_bn)
        if self.soft_sparse:
            mask = nn.sigmoid(x_bn - self.threshold_sigma)
        else:
            mask = (x_bn > self.threshold_sigma).astype(x.dtype)
        if self.reverse:
            mask = 1.0 - mask
        return x * mask
