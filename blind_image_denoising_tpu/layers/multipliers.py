"""Learnable multiplier layers.

Equivalents of reference custom_layers.py:218-507 (ChannelLearnableMultiplier,
SmoothChannelLearnableMultiplier, GlobalLearnableMultiplier) and the legacy
Multiplier / ChannelwiseMultiplier (custom_layers.py:1028-1162) that are part
of the reference's public API (__init__.py:27-30).

All are cheap VPU elementwise ops; XLA fuses them into surrounding convs.
Each sows its weight's L1 penalty into the 'losses' collection, matching the
Keras regularizers attached in the reference.
"""

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .activations import activation_fn
from .conv import sow_regularizer


def _trunc_normal_init(stddev: float):
    return nn.initializers.truncated_normal(stddev=stddev)


class ChannelLearnableMultiplier(nn.Module):
    """Per-channel scale tanh(relu(1+w))·x — no sign reversal, ≤1; w≈0 init
    so the gain starts near tanh(1)≈0.76 and learns towards [0, tanh(≥1)]
    (reference custom_layers.py:218-322). L1(1e-6) keeps w near 0."""
    l1_coefficient: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("w_multiplier", _trunc_normal_init(0.01), (x.shape[-1],))
        sow_regularizer(self, {"type": "l1", "config": {"l1": self.l1_coefficient}}, w)
        gain = jnp.tanh(jnp.maximum(1.0 + w, 0.0)).astype(x.dtype)
        return x * gain


class SmoothChannelLearnableMultiplier(nn.Module):
    """Per-channel scale sigmoid(2.5+w)·x ∈ (0, 1), starting ≈0.92
    (reference custom_layers.py:329-428)."""
    l1_coefficient: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("w_multiplier", _trunc_normal_init(0.01), (x.shape[-1],))
        sow_regularizer(self, {"type": "l1", "config": {"l1": self.l1_coefficient}}, w)
        gain = jax.nn.sigmoid(2.5 + w)
        return x * gain.astype(x.dtype)


class GlobalLearnableMultiplier(nn.Module):
    """Scalar version of ChannelLearnableMultiplier
    (reference custom_layers.py:433-507)."""
    l1_coefficient: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("w_multiplier", _trunc_normal_init(0.01), (1,))
        sow_regularizer(self, {"type": "l1", "config": {"l1": self.l1_coefficient}}, w)
        gain = jnp.tanh(jnp.maximum(1.0 + w, 0.0)).astype(x.dtype)
        return x * gain


class Multiplier(nn.Module):
    """Legacy learnable scalar scale act(w0 + multiplier)·x, where w0 is
    trainable (0-init) and the multiplier offset is frozen
    (reference custom_layers.py:1028-1091)."""
    multiplier: float = 1.0
    activation: str = "linear"
    l1_coefficient: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w0 = self.param("w0", nn.initializers.zeros_init(), (1,))
        if self.l1_coefficient > 0.0:
            sow_regularizer(
                self, {"type": "l1", "config": {"l1": self.l1_coefficient}}, w0)
        gain = activation_fn(self.activation)(w0 + self.multiplier)
        return x * gain.astype(x.dtype)


class ChannelwiseMultiplier(nn.Module):
    """Legacy per-channel scale act(w0 + multiplier)·x on the last axis
    (reference custom_layers.py:1097-1162); works on dense (B, F) and conv
    (B, H, W, C) tensors alike."""
    multiplier: float = 1.0
    activation: str = "linear"
    l1_coefficient: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w0 = self.param("w0", nn.initializers.zeros_init(), (x.shape[-1],))
        if self.l1_coefficient > 0.0:
            sow_regularizer(
                self, {"type": "l1", "config": {"l1": self.l1_coefficient}}, w0)
        gain = activation_fn(self.activation)(w0 + self.multiplier)
        return x * gain.astype(x.dtype)
