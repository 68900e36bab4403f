"""Functional training state.

Unlike the reference's ``tf.train.Checkpoint(step, epoch, model)``
(reference utilities.py:691-706) the state here carries the optimizer state
too, fixing the reference's lost-Adam-moments-on-resume quirk (SURVEY §5.4):
checkpointing this one pytree restores training exactly.
"""

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from flax import struct
import optax


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray                 # applied optimizer steps
    epoch: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # exponential moving average of params (train.ema > 0); None (an empty
    # pytree) when EMA is off, so pre-EMA checkpoints keep their structure
    ema_params: Any = None


def create_train_state(model, tx: optax.GradientTransformation,
                       rng: jax.Array,
                       sample_input: jnp.ndarray,
                       ema: bool = False) -> TrainState:
    """Initialize model variables and optimizer state.

    ``ema=True`` seeds ``ema_params`` with a copy of the initial params
    (the tf.train.ExponentialMovingAverage convention — no zero-debias
    needed; the in-step adaptive decay handles early-step bias)."""
    variables = model.init({"params": rng}, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.array, params) if ema else None,
    )


def param_count(state: TrainState) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(state.params))
