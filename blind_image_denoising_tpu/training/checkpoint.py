"""Orbax checkpointing: params + optimizer state + counters, keep-N policy.

Equivalent of the reference's tf.train.Checkpoint/CheckpointManager usage
(reference utilities.py:691-706, train_loop.py:146-163) but complete: the
reference drops optimizer slots on resume (only step/epoch/model are in the
checkpoint); here the whole TrainState round-trips, so Adam moments and the
LR schedule position survive preemption.
"""

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from ..logger import logger
from .train_state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval_steps: int = 1):
        self._directory = os.path.abspath(str(directory))
        os.makedirs(self._directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            create=True)
        self._mgr = ocp.CheckpointManager(self._directory, options=options)

    @property
    def directory(self) -> str:
        return self._directory

    def save(self, state: TrainState, force: bool = False) -> bool:
        step = int(state.step)
        if step in self._mgr.all_steps():
            return False  # idempotent: epoch-end + final save can coincide
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force)
        if saved:
            logger.info(f"saved checkpoint at step {step} "
                        f"in {self._directory}")
        return saved

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore into the structure of ``state`` (abstract target).

        Tolerates an ``ema_params`` presence mismatch in either direction
        (a pre-EMA checkpoint restored into an EMA-enabled run, or an
        EMA checkpoint restored by a caller that didn't ask for EMA —
        e.g. export, which wants the EMA weights whenever the run tracked
        them): on a structure error the restore retries with the other
        ema shape, so checkpoints stay forward- and backward-compatible."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            logger.info("no checkpoint found; starting from scratch")
            return state
        target = state
        try:
            # align the target's ema layout with the checkpoint's up
            # front (metadata read, no array IO) so the common case needs
            # exactly one restore attempt
            meta_tree = self._mgr.item_metadata(step).tree
            ckpt_has_ema = meta_tree.get("ema_params") is not None
            if ckpt_has_ema and state.ema_params is None:
                target = state.replace(ema_params=state.params)
            elif not ckpt_has_ema and state.ema_params is not None:
                target = state.replace(ema_params=None)
        except Exception:
            pass  # metadata probe is best-effort (orbax API drift);
            # the retry below still covers the mismatch
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, target)
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract))
        except Exception as first_err:
            alt = target.replace(
                ema_params=None if target.ema_params is not None
                else state.params)
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, alt)
            try:
                restored = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(abstract))
            except Exception:
                raise first_err
            logger.info(
                "checkpoint ema_params presence differs from the target "
                "structure; restored with the checkpoint's own layout")
        logger.info(f"restored checkpoint step {step} from {self._directory}")
        return restored

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
