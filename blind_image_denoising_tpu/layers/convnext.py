"""ConvNext residual block.

Equivalent of reference custom_layers.py:838-1022 (ConvNextBlock):
depthwise k×k → BN/LN → act → 1×1 expand (×4, activated) → dropout →
1×1 project → act → gamma (ChannelLearnableMultiplier).

TPU notes: the depthwise conv runs on the VPU-adjacent conv unit; the two
1×1 convs are batched matmuls over (B·H·W, C) that map directly onto the
MXU — the dominant FLOPs. The block takes plain dicts of conv parameters
(kernel_size / filters / activation / depth_multiplier) like the reference
so backbone builders can share param tables.
"""

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..constants import (
    DEFAULT_SOFTORTHOGONAL_L1, DEFAULT_SOFTORTHOGONAL_L2,
    DEFAULT_SOFTORTHOGONAL_LAMBDA,
    DEFAULT_SOFTORTHONORMAL_L1, DEFAULT_SOFTORTHONORMAL_L2,
    DEFAULT_SOFTORTHONORMAL_LAMBDA,
)
from .conv import ConvBlock
from .multipliers import ChannelLearnableMultiplier


def soft_ortho_spec(orthonormal: bool) -> dict:
    """Regularizer spec for the soft-orthogonal/orthonormal options used by
    ConvNext blocks and attention layers (reference custom_layers.py:948-980)."""
    if orthonormal:
        return {"type": "soft_orthonormal", "config": {
            "lambda_coefficient": DEFAULT_SOFTORTHONORMAL_LAMBDA,
            "l1_coefficient": DEFAULT_SOFTORTHONORMAL_L1,
            "l2_coefficient": DEFAULT_SOFTORTHONORMAL_L2}}
    return {"type": "soft_orthogonal", "config": {
        "lambda_coefficient": DEFAULT_SOFTORTHOGONAL_LAMBDA,
        "l1_coefficient": DEFAULT_SOFTORTHOGONAL_L1,
        "l2_coefficient": DEFAULT_SOFTORTHOGONAL_L2}}


class ConvNextBlock(nn.Module):
    """conv_params_{1,2,3} are dicts in the reference's conv-param schema."""
    conv_params_1: Dict[str, Any]
    conv_params_2: Dict[str, Any]
    conv_params_3: Dict[str, Any]
    use_bn: bool = False
    use_ln: bool = True
    bn_center: bool = False
    use_gamma: bool = True
    dropout_rate: float = 0.0
    spatial_dropout_rate: float = 0.0
    use_soft_orthogonal_regularization: bool = False
    use_soft_orthonormal_regularization: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p1, p2, p3 = self.conv_params_1, self.conv_params_2, self.conv_params_3

        reg_1x1 = None
        if self.use_soft_orthogonal_regularization:
            reg_1x1 = soft_ortho_spec(orthonormal=False)
        if self.use_soft_orthonormal_regularization:
            reg_1x1 = soft_ortho_spec(orthonormal=True)

        # 1) depthwise k×k conv, then norm, then activation
        x = ConvBlock(
            features=0,
            kernel_size=p1.get("kernel_size", 7),
            depth_multiplier=p1.get("depth_multiplier", 1),
            use_bias=p1.get("use_bias", False),
            activation=p1.get("activation", "linear"),
            kernel_initializer=p1.get("kernel_initializer",
                                      p1.get("depthwise_initializer", "glorot_normal")),
            kernel_regularizer=p1.get("kernel_regularizer",
                                      p1.get("depthwise_regularizer", None)),
            use_bn=self.use_bn, use_ln=self.use_ln, bn_center=self.bn_center,
            dtype=self.dtype, name="conv_1")(x, train=train)

        # 2) 1×1 expand (×4) with activation, then dropout
        x = ConvBlock(
            features=p2["filters"], kernel_size=1,
            use_bias=p2.get("use_bias", False),
            activation=p2.get("activation", "linear"),
            kernel_initializer=p2.get("kernel_initializer", "glorot_normal"),
            kernel_regularizer=reg_1x1 or p2.get("kernel_regularizer", None),
            dropout_rate=self.dropout_rate,
            spatial_dropout_rate=self.spatial_dropout_rate,
            dtype=self.dtype, name="conv_2")(x, train=train)

        # 3) 1×1 project back
        x = ConvBlock(
            features=p3["filters"], kernel_size=1,
            use_bias=p3.get("use_bias", False),
            activation=p3.get("activation", "linear"),
            kernel_initializer=p3.get("kernel_initializer", "glorot_normal"),
            kernel_regularizer=reg_1x1 or p3.get("kernel_regularizer", None),
            dtype=self.dtype, name="conv_3")(x, train=train)

        # 4) gamma: learnable per-channel scale
        if self.use_gamma:
            x = ChannelLearnableMultiplier(name="gamma")(x)
        return x
