"""Multiscale ground-truth generation.

Equivalent of reference utilities.py:625-685 (multiscales_generator_fn):
repeated 2x2 VALID average-pool downsampling with optional clip / round /
channel-normalize, returning [level0, level1, ...] (level 0 = input).
Runs fused inside the jitted train step.
"""

from typing import List

import jax.numpy as jnp

from ..constants import DEFAULT_EPSILON
from .resize import avg_pool_valid


def multiscale_targets(x: jnp.ndarray, no_scales: int,
                       clip_values: bool = False,
                       round_values: bool = False,
                       normalize_values: bool = False) -> List[jnp.ndarray]:
    scales = [x]
    for _ in range(no_scales):
        x = avg_pool_valid(x, (2, 2), (2, 2))
        if clip_values:
            x = jnp.clip(x, 0.0, 255.0)
        if round_values:
            x = jnp.round(x)
        if normalize_values:
            x = x + DEFAULT_EPSILON
            x = x / jnp.sum(x, axis=-1, keepdims=True)
        scales.append(x)
    return scales
