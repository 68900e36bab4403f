"""Strict bias-free BatchNorm (`batchnorm: "bias_free"`, layers/norm.py
BiasFreeBatchNorm): the CVPR-2020 paper's actual recipe — normalize by
the running second moment only, no mean subtraction — making a ReLU
network exactly positively homogeneous at inference (the reference's
center=False BN still subtracts running means; docs/INTERPRETABILITY.md
measures the bias that leaves behind)."""

import copy

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax

from blind_image_denoising_tpu import analysis
from blind_image_denoising_tpu.layers.norm import (
    BiasFreeBatchNorm, parse_bn_flag)


def _bn_resnet_cfg(mode):
    return {
        "type": "resnet", "input_shape": ["?", "?", 3], "filters": 4,
        "no_layers": 2, "kernel_size": 3, "block_kernels": [3, 3],
        "block_filters": [4, 4], "activation": "relu",
        "batchnorm": mode, "value_range": [0, 255],
        "kernel_regularizer": "l1",
        "kernel_initializer": "glorot_normal"}


def _backbone_with_stats(mode, seed=0):
    """(forward, u) — inference-mode backbone with NONTRIVIAL running
    stats (as after training), single-image centered domain."""
    from blind_image_denoising_tpu.models import ResnetBackbone
    m = ResnetBackbone(config=_bn_resnet_cfg(mode))
    u = jnp.asarray(np.random.default_rng(seed).normal(
        size=(12, 12, 3)).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), u[None])
    rng = np.random.default_rng(seed + 1)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.uniform(0.5, 2.0, a.shape).astype(np.float32)),
        vs["batch_stats"])
    variables = {"params": vs["params"], "batch_stats": stats}

    def fwd(d):
        return m.apply(variables, d[None])[0][0]

    return fwd, u


def test_parse_bn_flag():
    assert parse_bn_flag(True) == (True, False)
    assert parse_bn_flag(False) == (False, False)
    assert parse_bn_flag(None) == (False, False)
    assert parse_bn_flag("bias_free") == (True, True)
    assert parse_bn_flag("Bias-Free") == (True, True)
    with pytest.raises(ValueError):
        parse_bn_flag("rms")


def test_bias_free_bn_exact_homogeneity():
    """With bias-free BN and ReLU, inference is exactly positively
    homogeneous even with nontrivial running stats: f(3u) == 3f(u) and
    the net-bias map vanishes (Euler's identity)."""
    fwd, u = _backbone_with_stats("bias_free")
    y1 = np.asarray(fwd(u))
    y3 = np.asarray(fwd(3.0 * u))
    np.testing.assert_allclose(y3, 3.0 * y1, rtol=1e-4, atol=1e-4)
    y, bias = analysis.net_bias_map(fwd, u, center=0.0)
    assert np.abs(y).max() > 0
    assert np.abs(bias).max() < 1e-4


def test_standard_bn_is_not_homogeneous():
    """Contrast: the reference's center=False BN subtracts running
    means, so the same architecture with standard BN has a nonzero
    net-bias map under the same protocol."""
    fwd, u = _backbone_with_stats(True)
    y, bias = analysis.net_bias_map(fwd, u, center=0.0)
    assert np.abs(bias).max() > 1e-2


def test_bias_free_bn_train_updates_and_dp_global_stats():
    """Train mode updates mean_sq toward the batch second moment, and
    under a batch-sharded jit the reduction is GLOBAL (same stats as
    single-device on the same global batch)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    bn = BiasFreeBatchNorm(use_running_average=False, momentum=0.9)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 4, 4, 3)).astype(np.float32) * 2.0)
    vs = bn.init(jax.random.PRNGKey(0), x)

    def step(v, xx):
        _, mut = bn.apply(v, xx, mutable=["batch_stats"])
        return mut["batch_stats"]["mean_sq"]

    ref = step(vs, x)
    expected = 0.9 * 1.0 + 0.1 * np.mean(np.square(np.asarray(x)),
                                         axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(ref), expected, rtol=1e-5)

    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("data",))
    sharded = jax.jit(
        step, in_shardings=(None, NamedSharding(mesh, P("data"))),
        out_shardings=None)(vs, x)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                               rtol=1e-5)


def test_unet_laplacian_rejects_bias_free():
    from blind_image_denoising_tpu.models import UnetLaplacianBackbone
    m = UnetLaplacianBackbone(config={"use_bn": "bias_free"})
    with pytest.raises(ValueError, match="LayerNorm-based"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))


@pytest.mark.slow  # full train->export->load CLI roundtrip (~40 s)
def test_bias_free_train_export_load_roundtrip(tmp_path):
    """The full pipeline accepts the mode: train 2 steps, export, load,
    serve — and the artifact's batch_stats round-trip."""
    from blind_image_denoising_tpu.training.train_loop import train_loop
    from blind_image_denoising_tpu.inference.export import (
        export_model, load_exported_model)

    cfg = {
        "model": {"backbone": _bn_resnet_cfg("bias_free"),
                  "denoiser": {"use_bias": False, "output_channels": 3}},
        "train": {"epochs": 0, "total_steps": 2, "checkpoint_every": -1,
                  "visualization_every": -1, "use_test_images": False,
                  "optimizer": {"type": "adam", "schedule": {
                      "type": "cosine_decay", "config": {
                          "learning_rate": 0.001, "decay_steps": 100}}}},
        "loss": {"hinge": 0.0, "mae_multiplier": 1.0,
                 "ssim_multiplier": -1.0},
        "dataset": {"batch_size": 2, "input_shape": [16, 16, 3],
                    "additional_noise": [1, 10], "inputs": []},
    }
    state = train_loop(copy.deepcopy(cfg), tmp_path / "ckpt")
    stats = flax.traverse_util.flatten_dict(
        jax.device_get(state.batch_stats), sep="/")
    assert any("mean_sq" in k for k in stats)
    # training moved the stats off their init value
    assert any(float(np.abs(v - 1.0).max()) > 1e-6 for v in stats.values())

    export_model(cfg, tmp_path / "ckpt", tmp_path / "export",
                 to_stablehlo=False)
    den = load_exported_model(tmp_path / "export")
    y = den(np.random.randint(0, 255, (20, 24, 3), np.uint8))
    assert y.shape == (20, 24, 3) and y.dtype == np.uint8
