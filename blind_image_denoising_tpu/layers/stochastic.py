"""Stochastic regularization layers.

StochasticDepth (DropPath, reference custom_layers.py:174-212) and
RandomOnOff (whole-residual-branch dropout, reference custom_layers.py:107-126).
Both are per-sample Bernoulli masks broadcast over all non-batch dims with
inverted scaling 1/(1-rate) — exactly Keras Dropout with
noise_shape=(B,1,1,1).
"""

import flax.linen as nn
import jax.numpy as jnp


class StochasticDepth(nn.Module):
    """Per-sample residual-path drop (timm DropPath semantics)."""
    drop_path_rate: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if not 0.0 <= self.drop_path_rate <= 1.0:
            raise ValueError("drop_path_rate must be within [0, 1]")
        if self.drop_path_rate == 0.0:
            return x
        return nn.Dropout(
            rate=self.drop_path_rate,
            broadcast_dims=tuple(range(1, x.ndim)),
            deterministic=not train)(x)


class RandomOnOff(nn.Module):
    """Drops the whole tensor per-sample with probability ``rate``
    (reference custom_layers.py:107-126)."""
    rate: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.rate <= 0.0:
            return x
        return nn.Dropout(
            rate=self.rate,
            broadcast_dims=tuple(range(1, x.ndim)),
            deterministic=not train)(x)
