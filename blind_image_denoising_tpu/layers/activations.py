"""String-dispatched activations.

Equivalent of reference utilities.py:229-267 (activation_wrapper). All are
plain jnp functions (VPU-friendly, XLA fuses them into neighboring convs);
PReLU — the only parametric one — is provided by the :class:`Activation`
module.
"""

from typing import Callable

import jax
import jax.numpy as jnp
import flax.linen as nn


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """Mish: A Self Regularized Non-Monotonic Activation Function
    (reference custom_layers.py:18-31)."""
    return x * jnp.tanh(jax.nn.softplus(x))


def hard_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Keras hard_sigmoid: 0 below -2.5, 1 above 2.5, linear in between."""
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


_ACTIVATIONS = {
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "gelu": jax.nn.gelu,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "hard_sigmoid": hard_sigmoid,
    "softplus": jax.nn.softplus,
    "mish": mish,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.3),
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.3),
    "leakyrelu_01": lambda x: jax.nn.leaky_relu(x, 0.1),
    "leaky_relu_01": lambda x: jax.nn.leaky_relu(x, 0.1),
    "leakyrelu_001": lambda x: jax.nn.leaky_relu(x, 0.01),
    "leaky_relu_001": lambda x: jax.nn.leaky_relu(x, 0.01),
}


def activation_fn(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Resolve an activation name to a function. Raises on unknown names."""
    if name is None:
        return _ACTIVATIONS["linear"]
    if callable(name):
        return name
    key = name.strip().lower()
    if key in _ACTIVATIONS:
        return _ACTIVATIONS[key]
    raise ValueError(f"unknown activation [{name}]")


class Activation(nn.Module):
    """Activation as a module; supports parametric 'prelu' (constrained
    per-channel slope shared over spatial axes, reference utilities.py:243-252).
    """
    activation: str = "linear"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        key = (self.activation or "linear").strip().lower()
        if key == "prelu":
            alpha = self.param(
                "prelu_alpha", nn.initializers.constant(0.1), (x.shape[-1],))
            # cast the f32 param into the activation dtype so bf16 compute
            # chains stay bf16 (jnp.where would otherwise promote to f32)
            alpha = jnp.clip(alpha, 0.0, 1.0).astype(x.dtype)
            return jnp.where(x >= 0.0, x, alpha * x)
        return activation_fn(key)(x)
