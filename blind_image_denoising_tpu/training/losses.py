"""Config-driven loss functions.

Equivalent of reference loss.py:152-253 (loss_function_builder):

* ``denoiser`` — per-scale supervised loss: hinged MAE × mae_multiplier +
  hinged RMSE × mse_multiplier + (1 − SSIM(filter_size=7)) × ssim_multiplier,
  plus always-reported un-hinged MAE / RMSE metrics. A multiplier ≤ 0
  disables its term (e.g. ``mse_multiplier: -1`` in unet_laplacian_v6).
* ``model`` — the summed kernel-regularization penalties (the 'losses'
  linen collection, i.e. the Keras ``model.losses`` analog) × the
  ``regularization`` multiplier.

Everything is pure jnp and runs inside the jitted train step — losses for
all scales fuse into one XLA program with the forward/backward pass.
"""

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..constants import (
    MAE_LOSS_STR, MSE_LOSS_STR, REGULARIZATION_LOSS_STR,
    SSIM_LOSS_STR, TOTAL_LOSS_STR,
)
from ..ops.losses import mae, rmse
from ..ops.ssim import ssim


def sum_losses_collection(losses_collection) -> jnp.ndarray:
    """Sum every sown penalty in a 'losses' variable collection."""
    leaves = jax.tree_util.tree_leaves(losses_collection)
    if not leaves:
        return jnp.zeros((), jnp.float32)
    return sum(jnp.sum(l) for l in leaves)


def loss_function_builder(config: Dict) -> Dict[str, Callable]:
    hinge = config.get("hinge", 0.0)
    cutoff = config.get("cutoff", 255.0)
    mae_multiplier = config.get("mae_multiplier", 1.0)
    mse_multiplier = config.get("mse_multiplier", 0.0)
    ssim_multiplier = config.get("ssim_multiplier", 1.0)
    regularization_multiplier = config.get("regularization", 1.0)

    use_mae = mae_multiplier > 0.0
    use_mse = mse_multiplier > 0.0
    use_ssim = ssim_multiplier > 0.0

    def model_loss(losses_collection) -> Dict[str, jnp.ndarray]:
        reg = sum_losses_collection(losses_collection)
        return {
            REGULARIZATION_LOSS_STR: reg,
            TOTAL_LOSS_STR: reg * regularization_multiplier,
        }

    def denoiser_loss(gt_batch: jnp.ndarray,
                      predicted_batch: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        # metrics: un-hinged MAE / RMSE, always reported
        mae_actual = mae(gt_batch, predicted_batch, hinge=0.0, cutoff=255.0)
        mse_actual = rmse(gt_batch, predicted_batch, hinge=0.0,
                          cutoff=255.0 * 255.0)

        total = jnp.zeros((), jnp.float32)
        ssim_term = jnp.zeros((), jnp.float32)
        if use_mae:
            total += mae_multiplier * mae(
                gt_batch, predicted_batch, hinge=hinge, cutoff=cutoff)
        if use_mse:
            total += mse_multiplier * rmse(
                gt_batch, predicted_batch, hinge=hinge,
                cutoff=cutoff * cutoff)
        if use_ssim:
            ssim_term = 1.0 - jnp.mean(ssim(
                gt_batch, predicted_batch, max_val=255.0, filter_size=7))
            total += ssim_multiplier * ssim_term

        return {
            TOTAL_LOSS_STR: total,
            MAE_LOSS_STR: mae_actual,
            MSE_LOSS_STR: mse_actual,
            SSIM_LOSS_STR: ssim_term,
        }

    return {"model": model_loss, "denoiser": denoiser_loss}
