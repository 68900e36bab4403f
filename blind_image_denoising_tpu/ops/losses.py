"""Denoising loss primitives (hinged MAE, RMSE, robust loss, PSNR).

Numerically faithful to reference loss.py:16-147, including its quirks,
which are kept deliberately so that training dynamics and reported metrics
match the reference:

  * ``mae_diff`` applies relu-with-threshold to |error|: values below the
    hinge become 0 (NOT shifted by the hinge), values above the cutoff are
    clamped to the cutoff (tf.keras.activations.relu semantics).
  * ``rmse_diff`` applies the hinged relu to the *signed* error, i.e.
    negative errors are zeroed before squaring (reference loss.py:92-113).
"""

import jax.numpy as jnp

from ..constants import DEFAULT_EPSILON


def _hinged_relu(x: jnp.ndarray, hinge: float, cutoff: float) -> jnp.ndarray:
    """tf.keras.activations.relu(x, threshold=hinge, max_value=cutoff)."""
    y = jnp.where(x > hinge, x, 0.0)
    return jnp.minimum(y, cutoff)


def mae_diff(error: jnp.ndarray, hinge: float = 0.0, cutoff: float = 255.0) -> jnp.ndarray:
    """Hinged/cut-off mean absolute error (reference loss.py:40-65)."""
    d = _hinged_relu(jnp.abs(error), hinge, cutoff)
    d = jnp.mean(d, axis=(1, 2, 3))
    return jnp.mean(d)


def mae(original: jnp.ndarray, prediction: jnp.ndarray, **kwargs) -> jnp.ndarray:
    return mae_diff(original - prediction, **kwargs)


def rmse_diff(error: jnp.ndarray, hinge: float = 0.0,
              cutoff: float = 255.0 * 255.0) -> jnp.ndarray:
    """Hinged root mean square error (reference loss.py:92-113).

    Note the reference quirk: the hinge acts on the signed error, so only
    positive residuals contribute.
    """
    d = _hinged_relu(error, hinge, cutoff)
    d = jnp.square(d)
    d = jnp.mean(d, axis=(1, 2, 3))
    d = jnp.sqrt(d + DEFAULT_EPSILON)
    return jnp.mean(d)


def rmse(original: jnp.ndarray, prediction: jnp.ndarray, **kwargs) -> jnp.ndarray:
    return rmse_diff(original - prediction, **kwargs)


def gar_loss(x: jnp.ndarray, alpha: float = 1.0, c: float = 1.0) -> jnp.ndarray:
    """Barron's General and Adaptive Robust loss (reference loss.py:16-35)."""
    a_2 = jnp.abs(alpha - 2.0)
    return (a_2 / alpha) * (jnp.power(jnp.square(x / c) / a_2 + 1.0, alpha / 2.0) - 1.0)


def improvement(original: jnp.ndarray, noisy: jnp.ndarray,
                denoised: jnp.ndarray) -> jnp.ndarray:
    """MAE(orig, noisy) - MAE(orig, denoised): positive = actual improvement
    (reference loss.py:136-147)."""
    return mae(original, noisy) - mae(original, denoised)


def psnr(original: jnp.ndarray, prediction: jnp.ndarray,
         max_val: float = 255.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB, mean over the batch."""
    mse = jnp.mean(jnp.square(original - prediction), axis=(1, 2, 3))
    return jnp.mean(20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(mse + 1e-12))
