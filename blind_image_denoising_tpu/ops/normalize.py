"""Value-range normalization and local/global contrast ops.

TPU-native functional equivalents of reference utilities.py:23-53,435-461,
566-620 and backbone_blocks.py:488-497. All functions are pure, jit-safe and
NHWC.
"""

import jax.numpy as jnp

from ..constants import DEFAULT_EPSILON
from .resize import avg_pool_same


def clip_normalized(x: jnp.ndarray) -> jnp.ndarray:
    """Clip to [-0.5, +0.5] (reference utilities.py:23-35)."""
    return jnp.clip(x, -0.5, 0.5)


def clip_unnormalized(x: jnp.ndarray) -> jnp.ndarray:
    """Clip to [0, 255] (reference utilities.py:41-53)."""
    return jnp.clip(x, 0.0, 255.0)


def normalize(x: jnp.ndarray, v_min: float = 0.0, v_max: float = 255.0) -> jnp.ndarray:
    """[v_min, v_max] -> [-0.5, +0.5] with clipping (reference utilities.py:449-461)."""
    y = jnp.clip(x, v_min, v_max)
    return (y - v_min) / (v_max - v_min) - 0.5


def denormalize(x: jnp.ndarray, v_min: float = 0.0, v_max: float = 255.0) -> jnp.ndarray:
    """[-0.5, +0.5] -> [v_min, v_max] with clipping (reference utilities.py:435-443)."""
    y = clip_normalized(x)
    return (y + 0.5) * (v_max - v_min) + v_min


def global_normalization(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-mean unit-sigma per (batch, channel) over spatial dims
    (reference utilities.py:566-575)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
    sigma = jnp.sqrt(var + DEFAULT_EPSILON)
    return (x - mean) / sigma


def local_normalization(x: jnp.ndarray, pool_size=(16, 16)) -> jnp.ndarray:
    """Local mean/sigma normalization via average pooling
    (reference utilities.py:581-596)."""
    mean = avg_pool_same(x, pool_size, (1, 1))
    var = avg_pool_same(jnp.square(x - mean), pool_size, (1, 1))
    sigma = jnp.sqrt(var + DEFAULT_EPSILON)
    return (x - mean) / sigma


def highpass_filter(x: jnp.ndarray, a: float = 8.0, b: float = 4.0) -> jnp.ndarray:
    """tanh-power mask keeping large magnitudes (reference utilities.py:602-608)."""
    return jnp.power(jnp.tanh(a * x), b) * x


def lowpass_filter(x: jnp.ndarray, a: float = 8.0, b: float = 4.0) -> jnp.ndarray:
    """tanh-power mask keeping small magnitudes (reference utilities.py:614-620)."""
    return (1.0 - jnp.power(jnp.tanh(a * x), b)) * x


def details(x: jnp.ndarray) -> jnp.ndarray:
    """Contrast/details extractor (reference backbone_blocks.py:488-497)."""
    x = global_normalization(x)
    return jnp.power(jnp.tanh(8.0 * x), 4.0) * x
