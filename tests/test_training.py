"""Training-prims tests: loss builder, optimizer/schedules, deep
supervision, train step — the loss-math coverage the reference lacks
(its test_loss.py is empty, SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blind_image_denoising_tpu.constants import TOTAL_LOSS_STR
from blind_image_denoising_tpu.training.losses import (
    loss_function_builder, sum_losses_collection)
from blind_image_denoising_tpu.training.optimizer import (
    deep_supervision_schedule_builder, optimizer_builder, schedule_builder,
    clip_by_per_tensor_norm)


def test_denoiser_loss_zero_for_identical():
    fns = loss_function_builder(
        {"hinge": 0.0, "mae_multiplier": 1.0, "ssim_multiplier": 1.0})
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 255, (2, 32, 32, 3)).astype(np.float32))
    out = fns["denoiser"](x, x)
    assert float(out[TOTAL_LOSS_STR]) < 1e-3
    assert float(out["mae_loss"]) < 1e-6


def test_denoiser_loss_hinge_zeroes_small_errors():
    fns = loss_function_builder(
        {"hinge": 2.0, "mae_multiplier": 1.0, "ssim_multiplier": -1.0})
    x = jnp.zeros((1, 16, 16, 3))
    y = jnp.full((1, 16, 16, 3), 1.5)   # |error| < hinge everywhere
    out = fns["denoiser"](x, y)
    assert float(out[TOTAL_LOSS_STR]) == 0.0
    assert float(out["mae_loss"]) == pytest.approx(1.5)  # metric un-hinged


def test_negative_multiplier_disables_term():
    fns = loss_function_builder(
        {"hinge": 0.0, "mae_multiplier": -1.0, "mse_multiplier": -1.0,
         "ssim_multiplier": -1.0})
    x = jnp.zeros((1, 16, 16, 3))
    y = jnp.full((1, 16, 16, 3), 100.0)
    assert float(fns["denoiser"](x, y)[TOTAL_LOSS_STR]) == 0.0


def test_model_loss_scales_regularization():
    fns = loss_function_builder({"regularization": 0.5})
    coll = {"a": {"regularization": jnp.asarray(4.0)}}
    out = fns["model"](coll)
    assert float(out[TOTAL_LOSS_STR]) == pytest.approx(2.0)
    assert float(sum_losses_collection(coll)) == pytest.approx(4.0)


@pytest.mark.parametrize("stype", [
    "constant_equal", "constant_low_to_high", "constant_high_to_low",
    "linear_low_to_high", "non_linear_low_to_high"])
def test_deep_supervision_schedules_normalized(stype):
    sched = deep_supervision_schedule_builder({"type": stype}, 4)
    for pct in (0.0, 0.5, 1.0):
        w = sched(pct)
        assert w.shape == (4,)
        assert np.isclose(w.sum(), 1.0)
        assert (w > 0).all()


def test_linear_low_to_high_moves_towards_full_res():
    sched = deep_supervision_schedule_builder(
        {"type": "linear_low_to_high"}, 3)
    start, end = sched(0.0), sched(1.0)
    assert start[0] < start[-1]   # starts favoring small scales
    assert end[0] > end[-1]       # ends favoring full resolution


def test_exponential_decay_schedule():
    s = schedule_builder({"type": "exponential_decay", "config": {
        "learning_rate": 0.1, "decay_steps": 100, "decay_rate": 0.5}})
    assert float(s(0)) == pytest.approx(0.1)
    assert float(s(100)) == pytest.approx(0.05)
    assert float(s(200)) == pytest.approx(0.025)


def test_cosine_decay_restarts_schedule():
    s = schedule_builder({"type": "cosine_decay_restarts", "config": {
        "learning_rate": 0.1, "decay_steps": 100,
        "t_mul": 2.0, "m_mul": 0.9, "alpha": 0.0}})
    assert float(s(0)) == pytest.approx(0.1, rel=1e-5)
    assert float(s(50)) == pytest.approx(0.05, rel=1e-4)   # mid-period cos
    # restart at step 100 with m_mul decay
    assert float(s(100)) == pytest.approx(0.09, rel=1e-4)
    # second period is 200 steps long: mid at 200
    assert float(s(200)) == pytest.approx(0.045, rel=1e-4)


def test_per_tensor_norm_clipping():
    t = clip_by_per_tensor_norm(1.0)
    grads = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.asarray([0.1])}
    clipped, _ = t.update(grads, t.init(grads))
    assert float(jnp.linalg.norm(clipped["a"])) == pytest.approx(1.0)
    assert float(clipped["b"][0]) == pytest.approx(0.1)  # under the norm


@pytest.mark.parametrize("otype", ["ADAM", "RMSPROP", "ADADELTA"])
def test_optimizer_builder_types(otype):
    tx, sched = optimizer_builder({
        "type": otype,
        "gradient_clipping_by_value": 0.5,
        "gradient_clipping_by_norm_local": 1.0,
        "gradient_clipping_by_norm": 2.0,
        "schedule": {"type": "cosine_decay", "config": {
            "learning_rate": 0.01, "decay_steps": 100}}})
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.ones((4, 4))}, state, params)
    assert updates["w"].shape == (4, 4)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_grad_accum_metrics_are_microbatch_means():
    """Logged metrics under grad accumulation must average over all
    micro-batches (reference train_loop.py:418-437 accumulates), not just
    report the last one."""
    from blind_image_denoising_tpu.models.hydra import model_builder
    from blind_image_denoising_tpu.training.train_state import create_train_state
    from blind_image_denoising_tpu.training.train_step import build_train_step

    cfg = {"backbone": {
        "type": "resnet", "input_shape": ["?", "?", 3], "filters": 4,
        "no_layers": 1, "kernel_size": 3, "block_kernels": [3],
        "block_filters": [4], "activation": "relu", "batchnorm": False,
        "value_range": [0, 255], "kernel_regularizer": "l1",
        "kernel_initializer": "glorot_normal"},
        "denoiser": {"use_bias": False, "output_channels": 3}}
    loss_fns = loss_function_builder(
        {"hinge": 0.0, "mae_multiplier": 1.0, "ssim_multiplier": -1.0,
         "regularization": 0.0})
    tx, _ = optimizer_builder({
        "type": "ADAM",
        "schedule": {"type": "cosine_decay", "config": {
            "learning_rate": 0.01, "decay_steps": 1000}}})

    hydra = model_builder(cfg).hydra
    sample = jnp.zeros((2, 16, 16, 3))
    state = create_train_state(hydra, tx, jax.random.PRNGKey(0), sample)
    # no noise / flips / dropout -> per-micro-batch loss depends only on the
    # data, so the accumulated metric is checkable exactly
    step_fn = jax.jit(build_train_step(
        hydra, tx, loss_fns, no_outputs=1, additive_noise=None,
        multiplicative_noise=None, random_left_right=False,
        random_up_down=False, grad_accum=2))

    rng_img = np.random.default_rng(1)
    a = rng_img.uniform(0, 64, (2, 16, 16, 3)).astype(np.float32)
    b = rng_img.uniform(128, 255, (2, 16, 16, 3)).astype(np.float32)
    dw = jnp.ones((1,), jnp.float32)
    key = jax.random.PRNGKey(7)

    def metric_of(chunk0, chunk1):
        batch = jnp.asarray(np.concatenate([chunk0, chunk1], axis=0))
        _, metrics = step_fn(state, batch, key, dw)
        return float(metrics[TOTAL_LOSS_STR])

    m_ab = metric_of(a, b)
    f_a = metric_of(a, a)   # == f(a): mean of two identical micro-batches
    f_b = metric_of(b, b)
    assert f_a != pytest.approx(f_b, rel=1e-3)  # distinguishable chunks
    assert m_ab == pytest.approx((f_a + f_b) / 2.0, rel=1e-5)


def test_train_step_decreases_loss_tiny_model():
    """A few steps on a fixed batch must reduce total loss (sanity of the
    whole fwd/bwd/update path)."""
    from blind_image_denoising_tpu.models.hydra import model_builder
    from blind_image_denoising_tpu.training.train_state import create_train_state
    from blind_image_denoising_tpu.training.train_step import build_train_step

    cfg = {"backbone": {
        "type": "resnet", "input_shape": ["?", "?", 3], "filters": 4,
        "no_layers": 1, "kernel_size": 3, "block_kernels": [3],
        "block_filters": [4], "activation": "relu", "batchnorm": False,
        "value_range": [0, 255], "kernel_regularizer": "l1",
        "kernel_initializer": "glorot_normal"},
        "denoiser": {"use_bias": False, "output_channels": 3}}
    loss_fns = loss_function_builder(
        {"hinge": 0.0, "mae_multiplier": 1.0, "ssim_multiplier": -1.0,
         "regularization": 0.0})
    tx, _ = optimizer_builder({
        "type": "ADAM",
        "schedule": {"type": "cosine_decay", "config": {
            "learning_rate": 0.01, "decay_steps": 1000}}})

    hydra = model_builder(cfg).hydra
    sample = jnp.zeros((4, 16, 16, 3))
    state = create_train_state(hydra, tx, jax.random.PRNGKey(0), sample)
    step_fn = jax.jit(build_train_step(
        hydra, tx, loss_fns, no_outputs=1,
        additive_noise=[5, 10], grad_accum=1))

    batch = jnp.asarray(np.random.default_rng(0)
                        .uniform(0, 255, (4, 16, 16, 3)).astype(np.float32))
    dw = jnp.ones((1,), jnp.float32)
    losses = []
    for i in range(5):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(42), dw)
        losses.append(float(metrics[TOTAL_LOSS_STR]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_uint8_batch_transfer_equivalent():
    """A uint8 batch (cheap host→device transfer) must produce the same
    step as the float32 batch it was rounded from."""
    from blind_image_denoising_tpu.models.hydra import model_builder
    from blind_image_denoising_tpu.training.train_state import create_train_state
    from blind_image_denoising_tpu.training.train_step import build_train_step

    cfg = {"backbone": {
        "type": "resnet", "input_shape": ["?", "?", 3], "filters": 4,
        "no_layers": 1, "kernel_size": 3, "block_kernels": [3],
        "block_filters": [4], "activation": "relu", "batchnorm": False,
        "value_range": [0, 255], "kernel_regularizer": "l1",
        "kernel_initializer": "glorot_normal"},
        "denoiser": {"use_bias": False, "output_channels": 3}}
    loss_fns = loss_function_builder({"hinge": 0.0, "mae_multiplier": 1.0,
                                      "ssim_multiplier": -1.0})
    tx, _ = optimizer_builder({
        "type": "ADAM", "schedule": {"type": "cosine_decay", "config": {
            "learning_rate": 0.01, "decay_steps": 100}}})
    hydra = model_builder(cfg).hydra
    sample = jnp.zeros((2, 16, 16, 3))
    state = create_train_state(hydra, tx, jax.random.PRNGKey(0), sample)
    step = jax.jit(build_train_step(hydra, tx, loss_fns, no_outputs=1,
                                    additive_noise=[5, 10], grad_accum=1))
    f32 = jnp.asarray(np.round(np.random.default_rng(0)
                      .uniform(0, 255, (2, 16, 16, 3))).astype(np.float32))
    u8 = jnp.asarray(np.asarray(f32).astype(np.uint8))
    key = jax.random.PRNGKey(5)
    dw = jnp.ones((1,), jnp.float32)
    _, m_f32 = step(state, f32, key, dw)
    _, m_u8 = step(state, u8, key, dw)
    assert float(m_f32[TOTAL_LOSS_STR]) == pytest.approx(
        float(m_u8[TOTAL_LOSS_STR]), rel=1e-6)


def test_finetune_from_exported_artifact_dir(tmp_path):
    """weights_directory accepts an exported-artifact dir (params.msgpack
    — e.g. a packaged pretrained model), not only a checkpoint dir: the
    'fine-tune the shipped flagship' path (train_loop.py fine-tune
    block). LR=0 isolates the load: after one step the params must equal
    the artifact's, not the fresh init."""
    import copy
    import json
    import numpy as np
    import jax
    from conftest import tiny_resnet_hydra, TINY_RESNET_MODEL
    from blind_image_denoising_tpu.inference.export import (
        save_params_artifact)
    from blind_image_denoising_tpu.training.train_loop import train_loop

    hydra, variables = tiny_resnet_hydra()
    donor_params = jax.tree_util.tree_map(lambda p: p * 3.0 + 0.125,
                                          variables["params"])
    art = save_params_artifact(
        donor_params, {"model": copy.deepcopy(TINY_RESNET_MODEL)},
        tmp_path / "artifact")

    cfg = {
        "model": copy.deepcopy(TINY_RESNET_MODEL),
        "train": {"epochs": 1, "total_steps": 1, "checkpoint_every": -1,
                  "visualization_every": -1, "use_test_images": False,
                  "optimizer": {"type": "adam", "schedule": {
                      "type": "exponential_decay", "config": {
                          "learning_rate": 0.0, "decay_rate": 0.9,
                          "decay_steps": 100}}}},
        "loss": {"hinge": 0.0, "mae_multiplier": 1.0,
                 "ssim_multiplier": -1.0},
        "dataset": {"batch_size": 2, "input_shape": [16, 16, 3],
                    "additional_noise": [5, 10], "inputs": []},
    }
    state = train_loop(cfg, tmp_path / "ckpt", weights_directory=art)
    assert int(state.step) == 1
    got = jax.tree_util.tree_leaves(state.params)
    want = jax.tree_util.tree_leaves(donor_params)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
