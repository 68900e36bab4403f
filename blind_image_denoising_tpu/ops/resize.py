"""Pooling and resampling primitives (NHWC, jit-safe, TPU-friendly).

These are the functional equivalents of the Keras pooling / UpSampling2D
layers the reference leans on (pyramid.py, upsampling.py:19-121,
downsampling.py:19-77). Average pooling with SAME padding matches TF
semantics: padded positions are excluded from the mean (count-aware
divide), which matters for pyramid round-trip fidelity at image borders.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _pool_dims(window: Tuple[int, int], strides: Tuple[int, int]):
    return (1, window[0], window[1], 1), (1, strides[0], strides[1], 1)


def avg_pool_same(x: jnp.ndarray, window, strides) -> jnp.ndarray:
    """TF-compatible AveragePooling2D(padding='same'): mean over valid taps."""
    window = tuple(int(w) for w in window)
    strides = tuple(int(s) for s in strides)
    dims, strd = _pool_dims(window, strides)
    summed = lax.reduce_window(
        x, 0.0, lax.add, dims, strd, padding="SAME")
    counts = lax.reduce_window(
        jnp.ones(x.shape[1:3], dtype=x.dtype)[None, :, :, None],
        0.0, lax.add, dims, strd, padding="SAME")
    return summed / counts


def avg_pool_valid(x: jnp.ndarray, window, strides) -> jnp.ndarray:
    """AveragePooling2D(padding='valid')."""
    window = tuple(int(w) for w in window)
    strides = tuple(int(s) for s in strides)
    dims, strd = _pool_dims(window, strides)
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strd, padding="VALID")
    return summed / float(window[0] * window[1])


def max_pool_same(x: jnp.ndarray, window=(2, 2), strides=(2, 2)) -> jnp.ndarray:
    dims, strd = _pool_dims(tuple(window), tuple(strides))
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strd, padding="SAME")


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def upsample_2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (Keras UpSampling2D 'nearest')."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def upsample_2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample with half-pixel centers (TF resize semantics)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize to a static (H, W) (tf.image.resize BILINEAR)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, int(size[0]), int(size[1]), c), method="bilinear")


def downsample_2x_stride(x: jnp.ndarray) -> jnp.ndarray:
    """Strided-slice 2x downsample (reference downsampling.py:61)."""
    return x[:, ::2, ::2, :]


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, H, W, C] → [B, H/r, W/r, C·r²] (pixel-unshuffle).

    The MXU-oriented stem transform (docs/PERF.md: the full-resolution
    level dominates HBM bytes and VPU work at tiny C; running it at
    H/r × W/r with C·r² channels raises arithmetic intensity without
    changing the pixel count). Channel blocks are ordered (row-offset,
    col-offset, channel) so ``depth_to_space`` is its exact inverse."""
    b, h, w, c = x.shape
    if h % r or w % r:
        raise ValueError(f"space_to_depth: H×W {h}×{w} not divisible by {r}")
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r,
                                                 r * r * c)


def depth_to_space(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, H, W, C] → [B, H·r, W·r, C/r²] (pixel-shuffle); inverse of
    ``space_to_depth``."""
    b, h, w, c = x.shape
    if c % (r * r):
        raise ValueError(f"depth_to_space: C={c} not divisible by {r * r}")
    x = x.reshape(b, h, w, r, r, c // (r * r))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * r, w * r,
                                                 c // (r * r))
