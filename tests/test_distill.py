"""Teacher-student distillation (training/distill.py) — a capability the
reference lacks (SURVEY §5.7 new-capability axis): quality transfer into
the TPU-tuned per-level architecture variants (docs/PERF.md)."""

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


TINY_BACKBONE = {
    "type": "resnet", "input_shape": ["?", "?", 3], "filters": 4,
    "no_layers": 1, "kernel_size": 3, "block_kernels": [3],
    "block_filters": [4], "activation": "relu", "batchnorm": False,
    "value_range": [0, 255], "kernel_regularizer": "l1",
    "kernel_initializer": "glorot_normal"}


def _tiny_student():
    cfg = {"backbone": dict(TINY_BACKBONE),
           "denoiser": {"use_bias": False, "output_channels": 3}}
    hydra = model_builder(cfg).hydra
    loss_fns = loss_function_builder(
        {"hinge": 0.0, "mae_multiplier": 1.0, "ssim_multiplier": -1.0})
    tx, _ = optimizer_builder({"type": "adam", "schedule": {
        "type": "cosine_decay",
        "config": {"learning_rate": 0.003, "decay_steps": 1000}}})
    state = create_train_state(hydra, tx, jax.random.PRNGKey(0),
                               jnp.zeros((2, 16, 16, 3)))
    return hydra, loss_fns, tx, state


def test_pure_distillation_moves_student_toward_teacher():
    """gt_weight=0: the only training signal is the teacher; the
    student-vs-teacher MAE must fall and the student's output must end up
    closer to the teacher target than where it started."""
    hydra, loss_fns, tx, state = _tiny_student()
    target = 128.0

    def teacher_fn(noisy):
        return jnp.full_like(noisy, target)

    step_fn = jax.jit(build_train_step(
        hydra, tx, loss_fns, no_outputs=1, additive_noise=[5, 10],
        teacher_fn=teacher_fn, distill_weight=1.0, distill_gt_weight=0.0))
    batch = jnp.asarray(np.random.default_rng(0)
                        .uniform(0, 255, (2, 16, 16, 3)).astype(np.float32))
    w = jnp.ones((1,), jnp.float32)
    first = None
    for i in range(30):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i), w)
        if first is None:
            first = float(metrics["distill/mae_loss"])
    last = float(metrics["distill/mae_loss"])
    assert "distill/total_loss" in metrics
    assert last < first * 0.7, (first, last)


def test_gt_weight_zero_ignores_ground_truth():
    """With pure distillation the hard-GT term must not contribute:
    total == distill total + regularization (scale losses still REPORTED
    as metrics, matching the hinge-metric convention)."""
    hydra, loss_fns, tx, state = _tiny_student()

    def teacher_fn(noisy):
        return jnp.full_like(noisy, 42.0)

    step_fn = jax.jit(build_train_step(
        hydra, tx, loss_fns, no_outputs=1, additive_noise=[5, 10],
        teacher_fn=teacher_fn, distill_weight=1.0, distill_gt_weight=0.0))
    batch = jnp.asarray(np.random.default_rng(1)
                        .uniform(0, 255, (2, 16, 16, 3)).astype(np.float32))
    _, m = step_fn(state, batch, jax.random.PRNGKey(0),
                   jnp.ones((1,), jnp.float32))
    total = float(m["total_loss"])
    expect = float(m["distill/total_loss"]) + float(m["regularization_loss"])
    assert total == pytest.approx(expect, rel=1e-5)
    assert float(m["scale_0/mae_loss"]) > 0.0   # still observable


def test_train_loop_distillation_end_to_end(tmp_path):
    """train.distillation with a teacher ARTIFACT DIR: the loop loads the
    teacher, trains, and logs distill metrics to metrics.jsonl."""
    from blind_image_denoising_tpu.inference.export import (
        save_params_artifact)
    from blind_image_denoising_tpu.training.train_loop import train_loop

    base_cfg = {
        "model": {"backbone": dict(TINY_BACKBONE),
                  "denoiser": {"use_bias": False, "output_channels": 3}},
        "train": {"epochs": 1, "total_steps": 2, "checkpoint_every": -1,
                  "visualization_every": -1, "use_test_images": False,
                  "optimizer": {"type": "adam", "schedule": {
                      "type": "cosine_decay", "config": {
                          "learning_rate": 0.001, "decay_steps": 100}}}},
        "loss": {"hinge": 0.0, "mae_multiplier": 1.0,
                 "ssim_multiplier": -1.0},
        "dataset": {"batch_size": 2, "input_shape": [16, 16, 3],
                    "additional_noise": [1, 10], "inputs": []},
    }

    # teacher: the same tiny architecture with freshly-initialized params
    hydra = model_builder(base_cfg["model"]).hydra
    variables = hydra.init({"params": jax.random.PRNGKey(7)},
                           jnp.zeros((1, 16, 16, 3)), train=False)
    teacher_dir = save_params_artifact(
        variables["params"], base_cfg, tmp_path / "teacher")

    cfg = json.loads(json.dumps(base_cfg))
    cfg["train"]["distillation"] = {
        "teacher": str(teacher_dir), "weight": 1.0, "gt_weight": 0.5}
    train_loop(cfg, tmp_path / "ckpt")
    lines = [json.loads(l) for l in
             (tmp_path / "ckpt" / "metrics.jsonl").read_text().splitlines()]
    assert any("distill/mae_loss" in rec for rec in lines), lines
    val = next(rec["distill/mae_loss"] for rec in lines
               if "distill/mae_loss" in rec)
    assert np.isfinite(val) and val > 0.0


def test_distillation_spec_validation(tmp_path):
    from blind_image_denoising_tpu.training.distill import build_teacher
    with pytest.raises(ValueError, match="teacher"):
        build_teacher({})
    with pytest.raises(ValueError, match="dtype"):
        build_teacher({"teacher": "x", "dtype": "float16"})
    # an artifact that exists but weights both terms to zero
    hydra_cfg = {"backbone": dict(TINY_BACKBONE),
                 "denoiser": {"use_bias": False, "output_channels": 3}}
    hydra = model_builder(hydra_cfg).hydra
    variables = hydra.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 16, 16, 3)), train=False)
    from blind_image_denoising_tpu.inference.export import (
        save_params_artifact)
    cfg = {"model": hydra_cfg,
           "dataset": {"input_shape": [16, 16, 3]}}
    d = save_params_artifact(variables["params"], cfg, tmp_path / "t")
    with pytest.raises(ValueError, match="nothing would train"):
        build_teacher({"teacher": str(d), "weight": 0, "gt_weight": 0})


def test_teacher_bf16_dtype_runs(tmp_path):
    """dtype: bfloat16 casts the teacher params and still produces a
    float32 finest-scale output."""
    from blind_image_denoising_tpu.inference.export import (
        save_params_artifact)
    from blind_image_denoising_tpu.training.distill import build_teacher
    hydra_cfg = {"backbone": dict(TINY_BACKBONE),
                 "denoiser": {"use_bias": False, "output_channels": 3}}
    hydra = model_builder(hydra_cfg).hydra
    variables = hydra.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 16, 16, 3)), train=False)
    cfg = {"model": hydra_cfg, "dataset": {"input_shape": [16, 16, 3]}}
    d = save_params_artifact(variables["params"], cfg, tmp_path / "t")
    fn, opts = build_teacher({"teacher": str(d), "dtype": "bfloat16"})
    y = fn(jnp.zeros((1, 16, 16, 3), jnp.float32))
    assert y.dtype == jnp.float32 and y.shape == (1, 16, 16, 3)
    assert opts == {"weight": 1.0, "gt_weight": 1.0}
