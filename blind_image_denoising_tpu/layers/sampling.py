"""Config-driven spatial up/down sampling modules.

Equivalents of reference upsampling.py:19-121 and downsampling.py:19-77.
All variants keep static shapes (XLA requirement); the "laplacian" upsample
commutes the 1×1 conv before the bilinear resize when the activation is
linear — same output, conv runs on 4× fewer pixels
(reference upsampling.py:74-101).
"""

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import (
    upsample_2x_bilinear,
    upsample_2x_nearest,
    max_pool_same,
    downsample_2x_stride,
)
from .conv import conv_block_from_params


def _conv_from_params(params: Dict, overrides: Dict, name: str,
                      dtype=None):
    return conv_block_from_params(params, name, dtype=dtype, **overrides)


class Upsample(nn.Module):
    """2x spatial upsample; ``upsample_type`` ∈ {conv2d_transpose,
    upsample_bilinear_conv2d, upsample_nearest_conv2d,
    upsample_laplacian_conv2d, nn, nearest, bilinear}."""
    upsample_type: str
    conv_params: Optional[Dict] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kind = self.upsample_type.strip().lower()
        if kind == "conv2d_transpose":
            return _conv_from_params(
                self.conv_params, {"transpose": True, "strides": (2, 2)},
                "conv", dtype=self.dtype)(x, train=train)
        if kind == "upsample_bilinear_conv2d":
            x = upsample_2x_bilinear(x)
            return _conv_from_params(
                self.conv_params, {"kernel_size": 3, "strides": (1, 1)},
                "conv", dtype=self.dtype)(x, train=train)
        if kind == "upsample_nearest_conv2d":
            x = upsample_2x_nearest(x)
            return _conv_from_params(
                self.conv_params, {"kernel_size": 3, "strides": (1, 1)},
                "conv", dtype=self.dtype)(x, train=train)
        if kind == "upsample_laplacian_conv2d":
            conv = _conv_from_params(
                self.conv_params, {"kernel_size": 1, "strides": (1, 1)},
                "conv", dtype=self.dtype)
            if (self.conv_params or {}).get("activation", "linear") == "linear":
                # conv commutes with bilinear resize → conv on 1/4 the pixels
                return upsample_2x_bilinear(conv(x, train=train))
            return conv(upsample_2x_bilinear(x), train=train)
        if kind in ("nn", "nearest"):
            return upsample_2x_nearest(x)
        if kind == "bilinear":
            return upsample_2x_bilinear(x)
        raise ValueError(f"unknown upsample_type [{self.upsample_type}]")


class Downsample(nn.Module):
    """2x spatial downsample; ``downsample_type`` ∈ {conv2d, maxpool,
    strides}."""
    downsample_type: str
    conv_params: Optional[Dict] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kind = self.downsample_type.strip().lower()
        if kind == "conv2d":
            return _conv_from_params(
                self.conv_params, {"kernel_size": 2, "strides": (2, 2)},
                "conv", dtype=self.dtype)(x, train=train)
        if kind == "maxpool":
            x = max_pool_same(x, (2, 2), (2, 2))
            if self.conv_params is not None:
                x = _conv_from_params(
                    self.conv_params, {"kernel_size": 1, "strides": (1, 1)},
                    "conv", dtype=self.dtype)(x, train=train)
            return x
        if kind == "strides":
            x = downsample_2x_stride(x)
            if self.conv_params is not None:
                x = _conv_from_params(
                    self.conv_params, {"kernel_size": 1, "strides": (1, 1)},
                    "conv", dtype=self.dtype)(x, train=train)
            return x
        raise ValueError(f"unknown downsample_type [{self.downsample_type}]")
