"""On-device noise corruption.

The reference corrupts crops on CPU tf.data workers
(reference dataset.py:161-238): with probability 0.5 multiplicative
truncated-normal noise (mean 1, std ~ U[lo, hi]), with probability 0.5
additive truncated-normal noise (std ~ U[lo, hi]), then rounding. Here the
corruption runs *inside the jitted train step* on TPU — HBM-bandwidth-bound
elementwise work that XLA fuses with the input cast, freeing the host
pipeline to do decode+crop only.

Deviation (documented): the reference draws one (on/off, std) tuple per
crop-group; we draw per *sample*, which is strictly more independent and
matches the README's claim #8 ("every sample in each batch uses independent
forms of noise", reference README.md:166).

tf.random.truncated_normal truncates at ±2σ — jax.random.truncated_normal
over [-2, 2] scaled by std is the same distribution.
"""

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def truncated_normal(key, shape, mean: float = 0.0, std=1.0,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Truncated normal at ±2σ (tf.random.truncated_normal semantics)."""
    return mean + std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def draw_stds(key, b: int, lo: float, hi: float,
              sampling: str = "uniform") -> jnp.ndarray:
    """Per-sample noise-std draws, shape [b, 1, 1, 1].

    ``uniform``: std ~ U[lo, hi] — the reference's semantics
    (reference dataset.py:189-225).

    ``log_uniform``: std ~ exp(U[log lo, log hi]) — equal probability
    mass per octave. With a wide training range like [1, 80], uniform
    sampling gives σ ≤ 10 only ~11% of draws, so the near-clean regime
    the README table evaluates at σ ∈ {1, 5, 10} is barely trained;
    log-uniform spends ~half the draws below √(lo·hi) ≈ 9.
    """
    if sampling == "uniform":
        return jax.random.uniform(key, (b, 1, 1, 1), minval=lo, maxval=hi)
    if sampling == "log_uniform":
        # math.log, not jnp.log: lo/hi are static Python floats and this
        # runs under a jit trace, where jnp ops return (constant) tracers
        # that float() cannot concretize
        lo = max(float(lo), 1e-3)
        hi = max(float(hi), lo)
        u = jax.random.uniform(key, (b, 1, 1, 1),
                               minval=math.log(lo), maxval=math.log(hi))
        return jnp.exp(u)
    raise ValueError(f"unknown noise_sampling [{sampling}] "
                     f"(expected 'uniform' or 'log_uniform')")


def corrupt_batch(
        key: jax.Array,
        batch: jnp.ndarray,
        additive_noise: Optional[Sequence[float]] = None,
        multiplicative_noise: Optional[Sequence[float]] = None,
        round_values: bool = True,
        noise_sampling: str = "uniform") -> jnp.ndarray:
    """Per-sample noise corruption of a float32 [B,H,W,C] batch in [0,255].

    Each sample independently: 50% chance of multiplicative noise with
    std ~ U[mlo, mhi], then 50% chance of additive noise with
    std ~ U[alo, ahi], then optional rounding. ``noise_sampling``
    switches the std draw (see ``draw_stds``); 'uniform' is the
    reference's semantics and the default.
    """
    b = batch.shape[0]
    use_add = additive_noise is not None and len(additive_noise) > 0
    use_mul = multiplicative_noise is not None and len(multiplicative_noise) > 0

    noisy = batch
    (k_mul_flag, k_mul_std, k_mul_noise,
     k_add_flag, k_add_std, k_add_noise) = jax.random.split(key, 6)

    if use_mul:
        mlo, mhi = float(min(multiplicative_noise)), float(max(multiplicative_noise))
        flags = jax.random.uniform(k_mul_flag, (b, 1, 1, 1)) > 0.5
        stds = draw_stds(k_mul_std, b, mlo, mhi, noise_sampling)
        noise = truncated_normal(k_mul_noise, batch.shape, mean=1.0, std=stds)
        noisy = jnp.where(flags, noisy * noise, noisy)

    if use_add:
        alo, ahi = float(min(additive_noise)), float(max(additive_noise))
        flags = jax.random.uniform(k_add_flag, (b, 1, 1, 1)) > 0.5
        stds = draw_stds(k_add_std, b, alo, ahi, noise_sampling)
        noise = truncated_normal(k_add_noise, batch.shape, mean=0.0, std=stds)
        noisy = jnp.where(flags, noisy + noise, noisy)

    if round_values:
        noisy = jnp.round(noisy)
    return noisy


def corrupt_batch_fixed_std(key: jax.Array, batch: jnp.ndarray,
                            std: float, round_values: bool = True) -> jnp.ndarray:
    """Additive truncated-normal noise at a fixed std — the eval-sweep
    corruption used by the reference noise-sweep evaluation
    (reference train_loop.py:507-529) and the README MAE benchmark."""
    noisy = batch + truncated_normal(key, batch.shape, mean=0.0, std=std)
    if round_values:
        noisy = jnp.round(noisy)
    return noisy


def random_flips(key: jax.Array, batch: jnp.ndarray,
                 left_right: bool = True, up_down: bool = True) -> jnp.ndarray:
    """Per-sample random horizontal/vertical flips (on-device geometric
    augmentation; reference dataset.py:134-160 flips per crop-group)."""
    b = batch.shape[0]
    k_lr, k_ud = jax.random.split(key)
    out = batch
    if left_right:
        flags = jax.random.uniform(k_lr, (b, 1, 1, 1)) > 0.5
        out = jnp.where(flags, out[:, :, ::-1, :], out)
    if up_down:
        flags = jax.random.uniform(k_ud, (b, 1, 1, 1)) > 0.5
        out = jnp.where(flags, out[:, ::-1, :, :], out)
    return out
