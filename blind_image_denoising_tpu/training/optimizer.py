"""Optimizers, LR schedules, deep-supervision weight schedules.

Equivalent of reference optimizer.py:21-226, rebuilt on optax:

* LR schedules: exponential_decay, cosine_decay, cosine_decay_restarts
  (SGDR closed form matching tf.keras CosineDecayRestarts including
  t_mul/m_mul/alpha).
* Optimizers: ADAM / RMSPROP / ADADELTA with the reference's three clipping
  modes — per-tensor clip-by-value, per-tensor clip-by-norm, global
  clip-by-norm — as optax gradient transformations chained before the
  update rule, all inside the jitted step.
* Deep-supervision schedules: per-output loss weights as a function of
  training progress (constant_equal / constant_low_to_high /
  constant_high_to_low / linear_low_to_high / non_linear_low_to_high).
"""

import math
from typing import Callable, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax


# --------------------------------------------------------------------------
# deep supervision (reference optimizer.py:21-78)

def deep_supervision_schedule_builder(
        config: Dict, no_outputs: int) -> Callable[[float], np.ndarray]:
    """Per-output loss weights as fn of percentage_done ∈ [0, 1].

    Convention: index 0 is the full-resolution output. 'low_to_high' starts
    favoring the small scales (high indices) and moves towards full-res."""
    if no_outputs <= 0:
        raise ValueError("no_outputs must be a positive integer")
    schedule_type = (config.get("type") or "").strip().lower()
    if not schedule_type:
        raise ValueError("schedule type cannot be empty")

    ramp = np.arange(1, no_outputs + 1, dtype=np.float32)
    ramp = ramp / ramp.sum()          # increasing towards the last output
    favor_small = ramp                # more weight on deeper/smaller scales
    favor_full = ramp[::-1].copy()    # more weight on full resolution

    if schedule_type == "constant_equal":
        w = np.full((no_outputs,), 1.0 / no_outputs, np.float32)
        return lambda percentage_done=0.0: w
    if schedule_type == "constant_low_to_high":
        return lambda percentage_done=0.0: favor_small
    if schedule_type == "constant_high_to_low":
        return lambda percentage_done=0.0: favor_full
    if schedule_type == "linear_low_to_high":
        return lambda percentage_done=0.0: (
            favor_small * (1.0 - percentage_done) + favor_full * percentage_done)
    if schedule_type == "non_linear_low_to_high":
        def schedule(percentage_done: float = 0.0):
            t = float(np.clip(np.tanh(2.5 * percentage_done), 0.0, 1.0))
            return favor_small * (1.0 - t) + favor_full * t
        return schedule
    raise ValueError(
        f"unknown deep supervision schedule type [{schedule_type}]")


# --------------------------------------------------------------------------
# LR schedules (reference optimizer.py:83-139)

def _cosine_decay_restarts(learning_rate: float, first_decay_steps: int,
                           t_mul: float = 2.0, m_mul: float = 0.9,
                           alpha: float = 0.001) -> optax.Schedule:
    """SGDR with geometrically growing restart periods — the closed form of
    tf.keras.optimizers.schedules.CosineDecayRestarts."""
    first_decay_steps = float(first_decay_steps)

    def schedule(step):
        completed = jnp.asarray(step, jnp.float32) / first_decay_steps
        if t_mul == 1.0:
            i_restart = jnp.floor(completed)
            fraction = completed - i_restart
        else:
            i_restart = jnp.floor(
                jnp.log(jnp.maximum(1.0 - completed * (1.0 - t_mul), 1e-12))
                / math.log(t_mul))
            sum_r = (1.0 - t_mul ** i_restart) / (1.0 - t_mul)
            fraction = (completed - sum_r) / (t_mul ** i_restart)
        m_fac = m_mul ** i_restart
        cosine = 0.5 * m_fac * (1.0 + jnp.cos(jnp.pi * fraction))
        return learning_rate * ((1.0 - alpha) * cosine + alpha)

    return schedule


def schedule_builder(config: Dict) -> optax.Schedule:
    schedule_type = (config.get("type") or "").strip().lower()
    params = config.get("config", {})
    if not schedule_type:
        raise ValueError("schedule type cannot be empty")

    if schedule_type == "exponential_decay":
        return optax.exponential_decay(
            init_value=params["learning_rate"],
            transition_steps=params["decay_steps"],
            decay_rate=params["decay_rate"],
            staircase=False)
    if schedule_type == "cosine_decay_restarts":
        return _cosine_decay_restarts(
            learning_rate=params["learning_rate"],
            first_decay_steps=params["decay_steps"],
            t_mul=params.get("t_mul", 2.0),
            m_mul=params.get("m_mul", 0.9),
            alpha=params.get("alpha", 0.001))
    if schedule_type == "cosine_decay":
        return optax.cosine_decay_schedule(
            init_value=params["learning_rate"],
            decay_steps=params["decay_steps"],
            alpha=params.get("alpha", 0.0001))
    raise ValueError(f"unknown LR schedule type [{schedule_type}]")


# --------------------------------------------------------------------------
# gradient clipping transforms

def clip_by_per_tensor_norm(max_norm: float) -> optax.GradientTransformation:
    """Clip each gradient tensor independently to ``max_norm`` (the TF
    per-variable ``clipnorm`` semantics)."""

    def update_fn(updates, state, params=None):
        del params

        def clip_leaf(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale

        return jax.tree_util.tree_map(clip_leaf, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


# --------------------------------------------------------------------------
# optimizer builder (reference optimizer.py:145-226)

def optimizer_builder(
        config: Dict) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """Build an optax optimizer + LR schedule from the ``train.optimizer``
    config section."""
    lr_schedule = schedule_builder(config["schedule"])

    clip_value = config.get("gradient_clipping_by_value", None)
    clip_norm_local = config.get("gradient_clipping_by_norm_local", None)
    clip_norm_global = config.get("gradient_clipping_by_norm", None)
    optimizer_type = config.get("type", "RMSprop").strip().upper()

    chain = []
    if clip_value is not None:
        chain.append(optax.clip(float(clip_value)))
    if clip_norm_local is not None:
        chain.append(clip_by_per_tensor_norm(float(clip_norm_local)))
    if clip_norm_global is not None:
        chain.append(optax.clip_by_global_norm(float(clip_norm_global)))

    if optimizer_type == "ADAM":
        if config.get("amsgrad", False):
            opt = optax.amsgrad(
                learning_rate=lr_schedule,
                b1=config.get("beta_1", 0.9),
                b2=config.get("beta_2", 0.999),
                eps=config.get("epsilon", 1e-07))
        else:
            opt = optax.adam(
                learning_rate=lr_schedule,
                b1=config.get("beta_1", 0.9),
                b2=config.get("beta_2", 0.999),
                eps=config.get("epsilon", 1e-07))
    elif optimizer_type == "RMSPROP":
        opt = optax.rmsprop(
            learning_rate=lr_schedule,
            decay=config.get("rho", 0.9),
            eps=config.get("epsilon", 1e-07),
            centered=config.get("centered", False),
            momentum=config.get("momentum", 0.0) or None)
    elif optimizer_type == "ADADELTA":
        opt = optax.adadelta(
            learning_rate=lr_schedule,
            rho=config.get("rho", 0.9),
            eps=config.get("epsilon", 1e-07))
    else:
        raise ValueError(f"unknown optimizer type [{optimizer_type}]")

    chain.append(opt)
    return optax.chain(*chain), lr_schedule
