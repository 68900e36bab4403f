"""Power-of-two spatial padding for any-size inference.

Equivalent of reference utilities.py:736-764 — but shape arithmetic happens
at trace time (shapes are static under jit), so the padded result has a
static shape and XLA compiles one program per power-of-2 bucket.
"""

import jax.numpy as jnp


def next_power_of_2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (int(n) - 1).bit_length()


def pad_to_power_of_2(x: jnp.ndarray):
    """Pad H and W (NHWC) up to the next power of two with zeros.

    Returns (padded, pad_h, pad_w); pad amounts are Python ints.
    """
    _, h, w, _ = x.shape
    pad_h = next_power_of_2(h) - h
    pad_w = next_power_of_2(w) - w
    padded = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="constant")
    return padded, pad_h, pad_w


def remove_padding(x: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """Undo pad_to_power_of_2."""
    _, h, w, _ = x.shape
    return x[:, : h - pad_h, : w - pad_w, :]
