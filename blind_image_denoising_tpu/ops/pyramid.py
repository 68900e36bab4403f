"""Gaussian / Laplacian multiscale pyramids as pure fused functions.

Functional TPU-native equivalent of the reference's Keras pyramid models
(pyramid.py:238-532). Forward/inverse pairs reconstruct exactly (round-trip
error at float32 resolution), which tests/test_pyramid.py asserts the same
way the reference's test_pyramid.py does.

Conventions copied from the reference:
  * downsample = AveragePooling2D(pool_size=kernel_size, strides=2, SAME)
  * upsample   = bilinear 2x (half-pixel centers)
  * NONE pyramid type = 1-level Gaussian passthrough
"""

from enum import Enum
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp

from .resize import avg_pool_same, upsample_2x_bilinear

DEFAULT_KERNEL_SIZE = (5, 5)


class PyramidType(Enum):
    NONE = 1
    GAUSSIAN = 2
    LAPLACIAN = 3

    @staticmethod
    def from_string(type_str: str) -> "PyramidType":
        if type_str is None or not isinstance(type_str, str) or not type_str.strip():
            raise ValueError(f"invalid pyramid type [{type_str}]")
        return PyramidType[type_str.strip().upper()]

    def to_string(self) -> str:
        return self.name


def gaussian_pyramid(x: jnp.ndarray, levels: int,
                     kernel_size=DEFAULT_KERNEL_SIZE) -> List[jnp.ndarray]:
    """Level 0 is the input; each level is a 2x avg-pool downsample
    (reference pyramid.py:238-280)."""
    scales = [x]
    for _ in range(1, levels):
        x = avg_pool_same(x, kernel_size, (2, 2))
        scales.append(x)
    return scales


def inverse_gaussian_pyramid(levels: List[jnp.ndarray]) -> jnp.ndarray:
    """Upsample chain with detail re-injection (reference pyramid.py:286-337)."""
    output = None
    previous = None
    for level_x in reversed(levels):
        if output is None:
            output = level_x
            previous = level_x
        else:
            output = upsample_2x_bilinear(output)
            level_up = upsample_2x_bilinear(previous)
            output = output + (level_x - level_up)
            previous = level_x
    return output


def laplacian_pyramid(x: jnp.ndarray, levels: int,
                      kernel_size=DEFAULT_KERNEL_SIZE) -> List[jnp.ndarray]:
    """Band-pass levels (x - up(down(x))) plus lowpass base
    (reference pyramid.py:343-395)."""
    scales = []
    for _ in range(levels - 1):
        down = avg_pool_same(x, kernel_size, (2, 2))
        smoothed = upsample_2x_bilinear(down)
        scales.append(x - smoothed)
        x = down
    scales.append(x)
    return scales


def inverse_laplacian_pyramid(levels: List[jnp.ndarray]) -> jnp.ndarray:
    """Upsample + add reconstruction (reference pyramid.py:401-445)."""
    output = None
    for level_x in reversed(levels):
        if output is None:
            output = level_x
        else:
            output = upsample_2x_bilinear(output) + level_x
    return output


def build_pyramid_fn(config: Optional[Dict]) -> Callable[[jnp.ndarray], List[jnp.ndarray]]:
    """Config-driven forward pyramid (reference pyramid.py:451-491)."""
    if config is None:
        levels, kernel_size, ptype = 1, DEFAULT_KERNEL_SIZE, PyramidType.NONE
    else:
        levels = config.get("levels", 1)
        kernel_size = tuple(config.get("kernel_size", DEFAULT_KERNEL_SIZE))
        ptype = PyramidType.from_string(config.get("type", "NONE"))

    if ptype in (PyramidType.GAUSSIAN, PyramidType.NONE):
        return lambda x: gaussian_pyramid(x, levels, kernel_size)
    if ptype == PyramidType.LAPLACIAN:
        return lambda x: laplacian_pyramid(x, levels, kernel_size)
    raise ValueError(f"don't know how to build pyramid type [{ptype}]")


def build_inverse_pyramid_fn(config: Optional[Dict]) -> Callable[[List[jnp.ndarray]], jnp.ndarray]:
    """Config-driven inverse pyramid (reference pyramid.py:497-532)."""
    if config is None:
        ptype = PyramidType.NONE
    else:
        ptype = PyramidType.from_string(config.get("type", "NONE"))

    if ptype in (PyramidType.GAUSSIAN, PyramidType.NONE):
        return inverse_gaussian_pyramid
    if ptype == PyramidType.LAPLACIAN:
        return inverse_laplacian_pyramid
    raise ValueError(f"don't know how to build pyramid type [{ptype}]")
