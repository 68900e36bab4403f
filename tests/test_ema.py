"""Weight-EMA tests (train.ema): in-step math, checkpoint structure
tolerance, loop/export integration. New capability vs the reference
(which has no weight averaging); semantics follow
tf.train.ExponentialMovingAverage(num_updates=step)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blind_image_denoising_tpu.models.hydra import model_builder
from blind_image_denoising_tpu.training.losses import loss_function_builder
from blind_image_denoising_tpu.training.optimizer import optimizer_builder
from blind_image_denoising_tpu.training.train_state import create_train_state
from blind_image_denoising_tpu.training.train_step import build_train_step

from conftest import TINY_RESNET_MODEL  # noqa: E402


def _tiny_setup(ema: bool):
    import copy
    hydra = model_builder(copy.deepcopy(TINY_RESNET_MODEL)).hydra
    loss_fns = loss_function_builder(
        {"hinge": 0.0, "mae_multiplier": 1.0, "ssim_multiplier": -1.0,
         "regularization": 0.0})
    tx, _ = optimizer_builder({
        "type": "ADAM",
        "schedule": {"type": "cosine_decay", "config": {
            "learning_rate": 0.01, "decay_steps": 1000}}})
    state = create_train_state(hydra, tx, jax.random.PRNGKey(0),
                               jnp.zeros((2, 16, 16, 3)), ema=ema)
    return hydra, tx, loss_fns, state


def test_ema_off_by_default():
    _, _, _, state = _tiny_setup(ema=False)
    assert state.ema_params is None


def test_ema_matches_manual_fold():
    """ema after k steps == the host-side fold of the per-step params with
    d_t = min(decay, (1+t)/(10+t)) — the num_updates ramp."""
    decay = 0.9
    hydra, tx, loss_fns, state = _tiny_setup(ema=True)
    step_fn = jax.jit(build_train_step(
        hydra, tx, loss_fns, no_outputs=1, additive_noise=[1, 5],
        multiplicative_noise=None, random_left_right=False,
        random_up_down=False, ema_decay=decay))

    batch = jnp.asarray(np.random.default_rng(0)
                        .uniform(0, 255, (2, 16, 16, 3)).astype(np.float32))
    dw = jnp.ones((1,), jnp.float32)

    manual = jax.device_get(state.params)
    for t in range(3):
        state, _ = step_fn(state, batch, jax.random.PRNGKey(t), dw)
        d = min(decay, (1.0 + t) / (10.0 + t))
        live = jax.device_get(state.params)
        manual = jax.tree_util.tree_map(
            lambda e, p: d * e + (1.0 - d) * p, manual, live)

    got = jax.device_get(state.ema_params)
    for g, m in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(manual)):
        np.testing.assert_allclose(g, m, rtol=1e-5, atol=1e-7)
    # and the average genuinely lags the live weights
    diffs = [float(np.abs(g - p).max()) for g, p in zip(
        jax.tree_util.tree_leaves(got),
        jax.tree_util.tree_leaves(jax.device_get(state.params)))]
    assert max(diffs) > 0.0


def test_checkpoint_tolerates_ema_presence_mismatch(tmp_path):
    """Both directions: an EMA checkpoint restored by a no-EMA caller
    (export) keeps its averaged weights; a pre-EMA checkpoint restored
    into an EMA-enabled run comes back with ema_params=None (the loop
    then seeds it)."""
    from blind_image_denoising_tpu.training.checkpoint import CheckpointManager

    _, _, _, with_ema = _tiny_setup(ema=True)
    _, _, _, without = _tiny_setup(ema=False)
    # make the average distinguishable from the live params
    with_ema = with_ema.replace(
        ema_params=jax.tree_util.tree_map(lambda p: p + 1.0,
                                          with_ema.params))

    m1 = CheckpointManager(str(tmp_path / "ema_ckpt"), max_to_keep=1)
    m1.save(with_ema, force=True)
    m1.wait()
    restored = m1.restore(without)   # target structure lacks ema
    assert restored.ema_params is not None
    np.testing.assert_allclose(
        jax.tree_util.tree_leaves(jax.device_get(restored.ema_params))[0],
        jax.tree_util.tree_leaves(jax.device_get(with_ema.ema_params))[0])

    m2 = CheckpointManager(str(tmp_path / "plain_ckpt"), max_to_keep=1)
    m2.save(without, force=True)
    m2.wait()
    restored2 = m2.restore(with_ema)  # target structure has ema
    assert restored2.ema_params is None


def _loop_config(total_steps: int, ema: float):
    import copy
    return {
        "model": copy.deepcopy(TINY_RESNET_MODEL),
        "train": {"epochs": 0, "total_steps": total_steps,
                  "checkpoint_every": -1, "visualization_every": -1,
                  "use_test_images": False, "ema": ema,
                  "optimizer": {"type": "adam", "schedule": {
                      "type": "cosine_decay", "config": {
                          "learning_rate": 0.001, "decay_steps": 100}}}},
        "loss": {"hinge": 0.0, "mae_multiplier": 1.0,
                 "ssim_multiplier": -1.0},
        "dataset": {"batch_size": 2, "input_shape": [16, 16, 3],
                    "additional_noise": [1, 10], "inputs": []},
    }


def test_train_loop_ema_end_to_end(tmp_path):
    """Loop tracks the EMA, resume restores it, export prefers it (and
    --no-ema opts out)."""
    from blind_image_denoising_tpu.training.train_loop import train_loop
    from blind_image_denoising_tpu.inference.export import (
        PARAMS_FILE, export_model)
    import flax.serialization

    cfg = _loop_config(total_steps=2, ema=0.5)
    state = train_loop(cfg, tmp_path / "ckpt")
    assert state.ema_params is not None
    live = jax.tree_util.tree_leaves(jax.device_get(state.params))
    avg = jax.tree_util.tree_leaves(jax.device_get(state.ema_params))
    assert any(float(np.abs(a - l).max()) > 0 for a, l in zip(avg, live))

    # resume continues the SAME average (restored, not re-seeded)
    state2 = train_loop(_loop_config(total_steps=3, ema=0.5),
                        tmp_path / "ckpt")
    assert int(state2.step) == 3
    assert state2.ema_params is not None

    def exported_first_leaf(out_dir, **kw):
        export_model(cfg, tmp_path / "ckpt", out_dir,
                     to_stablehlo=False, **kw)
        raw = (out_dir / PARAMS_FILE).read_bytes()
        variables = flax.serialization.msgpack_restore(raw)
        return jax.tree_util.tree_leaves(variables["params"])[0]

    ema_leaf = exported_first_leaf(tmp_path / "exp_ema")
    raw_leaf = exported_first_leaf(tmp_path / "exp_raw", use_ema=False)
    np.testing.assert_allclose(
        ema_leaf,
        jax.tree_util.tree_leaves(jax.device_get(state2.ema_params))[0],
        rtol=1e-6)
    np.testing.assert_allclose(
        raw_leaf,
        jax.tree_util.tree_leaves(jax.device_get(state2.params))[0],
        rtol=1e-6)
    assert float(np.abs(ema_leaf - raw_leaf).max()) > 0


def test_finetune_prefers_donor_ema(tmp_path):
    """weights_directory pointing at an EMA-tracking run loads the
    donor's AVERAGED weights — the same ones the donor's export ships."""
    from blind_image_denoising_tpu.training.train_loop import train_loop
    from blind_image_denoising_tpu.training.checkpoint import CheckpointManager

    donor_state = train_loop(_loop_config(total_steps=2, ema=0.5),
                             tmp_path / "donor")
    # a 0-step run: fine-tune load happens, no optimizer update after
    cfg = _loop_config(total_steps=0, ema=0.0)
    cfg["train"]["epochs"] = 0
    got = train_loop(cfg, tmp_path / "ft",
                     weights_directory=tmp_path / "donor")
    np.testing.assert_allclose(
        jax.tree_util.tree_leaves(jax.device_get(got.params))[0],
        jax.tree_util.tree_leaves(jax.device_get(donor_state.ema_params))[0],
        rtol=1e-6)


def test_train_loop_rejects_bad_ema():
    from blind_image_denoising_tpu.training.train_loop import train_loop
    with pytest.raises(ValueError, match="train.ema"):
        train_loop(_loop_config(total_steps=1, ema=1.0), "/tmp/_unused_ema")
