"""Classic U-Net backbone.

Equivalent of reference backbone_unet.py:18-266 + backbone_blocks.py:319-403
(unet_blocks): encoder levels of residual stacks with max-pool downsampling,
decoder with nearest-neighbor upsample + skip concat. Single full-res output.

Deviation (documented): the reference's unet builder crashes at trace time
(`conv2d_wrapper(..., channelwise_scaling=None)` — an unknown kwarg,
backbone_unet.py:215) and silently drops add_selector/add_sparsity because
unet_blocks doesn't accept those params; here the builder works and those
flags are honored.
"""

from typing import Any, Dict, List

import flax.linen as nn
import jax.numpy as jnp

from ..constants import (
    DEFAULT_BN_EPSILON, DEFAULT_BN_MOMENTUM,
    DEFAULT_CHANNELWISE_MULTIPLIER_L1, DEFAULT_MULTIPLIER_L1,
)
from ..layers.blocks import ResnetBlocks
from ..layers.conv import conv_block_from_params
from ..layers.misc import SparseBlock
from ..layers.norm import BiasFreeBatchNorm, parse_bn_flag
from ..layers.multipliers import ChannelwiseMultiplier, Multiplier
from ..ops.resize import max_pool_same, upsample_2x_nearest
from .resnet import _block_conv_params


class UnetBackbone(nn.Module):
    config: Dict[str, Any]
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        cfg = dict(self.config)
        use_bias = cfg.get("use_bias", False)
        use_bn, bn_bias_free = parse_bn_flag(
            cfg.get("use_bn", cfg.get("batchnorm", True)))
        no_levels = cfg.get("no_levels", 3)
        no_layers = cfg.get("no_layers", 1)
        kernel_regularizer = cfg.get("kernel_regularizer", "l1")
        kernel_initializer = cfg.get("kernel_initializer", "glorot_normal")
        dropout_rate = cfg.get("dropout_rate", -1)

        base_conv_params = dict(
            kernel_size=cfg.get("kernel_size", 3),
            filters=cfg.get("filters", 32),
            strides=(1, 1),
            padding="same",
            use_bias=use_bias,
            activation=cfg.get("base_activation", "linear"),
            kernel_regularizer=kernel_regularizer,
            kernel_initializer=kernel_initializer,
        )
        conv_params = _block_conv_params(cfg)

        def res_stack(name):
            return ResnetBlocks(
                no_layers=no_layers,
                first_conv_params=conv_params[0],
                second_conv_params=conv_params[1],
                third_conv_params=conv_params[2],
                use_bn=use_bn,
                bn_center=use_bias,
                bn_bias_free=bn_bias_free,
                use_gate=cfg.get("add_gates", False),
                dropout_rate=max(0.0, dropout_rate) if dropout_rate != -1 else 0.0,
                use_multiplier=cfg.get("add_learnable_multiplier", False),
                # reference backbone_unet.py:183 pool_size (11, 11)
                mean_sigma_pool=(
                    11 if cfg.get("add_mean_sigma_normalization", False)
                    else None),
                dtype=self.dtype, name=name)

        def bn(name):
            if bn_bias_free:
                return BiasFreeBatchNorm(
                    use_running_average=not train,
                    momentum=DEFAULT_BN_MOMENTUM, epsilon=DEFAULT_BN_EPSILON,
                    dtype=self.dtype, name=name)
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=DEFAULT_BN_MOMENTUM, epsilon=DEFAULT_BN_EPSILON,
                use_bias=use_bias, use_scale=True, dtype=self.dtype, name=name)

        y_input = x
        x = conv_block_from_params(base_conv_params, "base_conv",
                                   dtype=self.dtype)(x, train=train)
        if cfg.get("add_initial_bn", False):
            x = bn("initial_bn")(x)

        # --- encoder: residual stack per level, max-pool between levels
        levels = []
        for lvl in range(no_levels):
            if lvl > 0:
                x = conv_block_from_params(
                    conv_params[0], f"enc_{lvl}_proj",
                    dtype=self.dtype)(x, train=train)
            x = res_stack(f"enc_{lvl}_blocks")(x, train=train)
            levels.append(x)
            x = max_pool_same(x, (2, 2), (2, 2))

        # --- decoder: nearest 2x upsample + skip concat per level
        x = None
        for lvl, skip in reversed(list(enumerate(levels))):
            if x is None:
                x = skip
            else:
                x = upsample_2x_nearest(x)
                x = jnp.concatenate([x, skip], axis=-1)
            x = conv_block_from_params(
                conv_params[0], f"dec_{lvl}_proj",
                dtype=self.dtype)(x, train=train)
            x = res_stack(f"dec_{lvl}_blocks")(x, train=train)

        if cfg.get("add_final_bn", False):
            x = bn("final_bn")(x)
        if cfg.get("add_concat_input", False):
            x = jnp.concatenate([x, y_input], axis=-1)
        if cfg.get("add_sparse_features", False):
            x = SparseBlock(threshold_sigma=1.0, symmetrical=True,
                            name="sparse")(x, train=train)
        if cfg.get("add_channelwise_scaling", False):
            x = ChannelwiseMultiplier(
                multiplier=1.0, activation="relu",
                l1_coefficient=DEFAULT_CHANNELWISE_MULTIPLIER_L1,
                name="final_channelwise")(x)
        if cfg.get("add_learnable_multiplier", False):
            x = Multiplier(
                multiplier=1.0, activation="relu",
                l1_coefficient=DEFAULT_MULTIPLIER_L1,
                name="final_multiplier")(x)
        if cfg.get("add_clip", False):
            x = jnp.tanh(x)

        return [x]


KNOWN_KEYS = frozenset({
    "type", "input_shape", "value_range",
    "filters", "no_layers", "no_levels", "kernel_size", "activation",
    "base_activation", "use_bias", "use_bn", "batchnorm",
    "kernel_regularizer", "kernel_initializer",
    "block_kernels", "block_filters", "block_depthwise", "block_groups",
    "block_regularizer", "block_activation",
    "add_initial_bn", "add_final_bn", "add_concat_input", "add_gates",
    "add_channelwise_scaling", "add_learnable_multiplier",
    "add_mean_sigma_normalization", "add_clip", "add_sparse_features",
    "dropout_rate",
})
