"""Model assembly tests — config-parametrized like the reference's
test_model_denoiser.py:19-71. Structure checks use jax.eval_shape (no
compilation) so the whole packaged-config matrix stays fast on CPU; one
tiny model runs a real forward."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blind_image_denoising_tpu as bid
from blind_image_denoising_tpu.models import model_builder
from blind_image_denoising_tpu.models.hydra import Hydra

CONFIG_NAMES = sorted(bid.CONFIGS_DICT)


@pytest.mark.parametrize("name", CONFIG_NAMES)
def test_model_builder_structure(name):
    """Every packaged config builds; outputs are finest-first with halving
    spatial dims; all outputs have the configured channel count."""
    cfg = bid.CONFIGS_DICT[name]
    results = model_builder(cfg["model"])
    hydra = results.hydra

    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda r, v: hydra.init(r, v, train=False), rng, x)
    outs = jax.eval_shape(
        lambda v, im: hydra.apply(v, im, train=False), variables, x)

    assert isinstance(outs, list) and len(outs) >= 1
    out_ch = cfg["model"]["denoiser"].get("output_channels", 3)
    for i, o in enumerate(outs):
        assert o.shape == (1, 64 // (2 ** i), 64 // (2 ** i), out_ch)

    nparams = sum(int(np.prod(p.shape))
                  for p in jax.tree_util.tree_leaves(variables["params"]))
    assert nparams > 1000


@pytest.mark.parametrize("name", CONFIG_NAMES)
def test_model_builder_multiple_sizes(name):
    """Fully-convolutional: builds at several input sizes
    (reference test_model_denoiser.py checks 64/128/256)."""
    cfg = bid.CONFIGS_DICT[name]
    hydra = model_builder(cfg["model"]).hydra
    rng = jax.random.PRNGKey(0)
    for hw in (32, 64, 128):
        x = jax.ShapeDtypeStruct((1, hw, hw, 3), jnp.float32)
        variables = jax.eval_shape(
            lambda r, v: hydra.init(r, v, train=False), rng, x)
        outs = jax.eval_shape(
            lambda v, im: hydra.apply(v, im, train=False), variables, x)
        assert outs[0].shape == (1, hw, hw, 3)


def _tiny_model_config():
    cfg = copy.deepcopy(bid.CONFIGS_DICT["unet_laplacian_v6"]["model"])
    cfg["backbone"].update(depth=2, width=1, filters=4)
    cfg["denoiser"]["filters"] = 4
    return cfg


def test_tiny_hydra_forward_range():
    """Real forward: outputs clamp to the value range and respond to input."""
    cfg = _tiny_model_config()
    hydra = model_builder(cfg).hydra
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 255, (2, 32, 32, 3)).astype(np.float32))
    variables = hydra.init({"params": rng}, x, train=False)
    outs = hydra.apply(variables, x, train=False)
    assert len(outs) == 2
    y = np.asarray(outs[0])
    assert y.shape == (2, 32, 32, 3)
    assert y.min() >= 0.0 and y.max() <= 255.0  # denormalized range


def test_tiny_hydra_train_mode_collections():
    """train=True with mutable losses/batch_stats works and sows penalties."""
    cfg = _tiny_model_config()
    hydra = model_builder(cfg).hydra
    x = jnp.ones((1, 16, 16, 3), jnp.float32)
    variables = hydra.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    outs, mut = hydra.apply(
        variables, x, train=True, mutable=["losses", "batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert jax.tree_util.tree_leaves(mut["losses"])
    total = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(mut["losses"]))
    assert float(total) > 0.0


def test_segnet_raises():
    from blind_image_denoising_tpu.models import SegnetBackbone
    m = SegnetBackbone(config={})
    with pytest.raises(NotImplementedError):
        m.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 3)))


def test_scale_equivariance_bias_free():
    """Bias-free network: backbone(a·x) ≈ a·backbone(x) — the CVPR-2020
    property the whole design rests on (reference README.md:24-40)."""
    from blind_image_denoising_tpu.models import ResnetBackbone
    cfg = dict(
        type="resnet", filters=4, no_layers=1, kernel_size=3,
        block_kernels=[3, 3], block_filters=[4, 4],
        activation="relu", use_bn=False, batchnorm=False, use_bias=False,
        kernel_regularizer="l1", kernel_initializer="glorot_normal")
    m = ResnetBackbone(config=cfg)
    x = jnp.asarray(np.random.default_rng(1)
                    .normal(size=(1, 16, 16, 3)).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), x)
    y1 = np.asarray(m.apply(vs, x)[0])
    y2 = np.asarray(m.apply(vs, 3.0 * x)[0])
    np.testing.assert_allclose(3.0 * y1, y2, rtol=1e-4, atol=1e-4)


def test_mean_sigma_normalization_changes_output():
    """add_mean_sigma_normalization must actually alter the computation —
    it local-mean/sigma-normalizes each block's residual-branch input.
    (The reference snapshot parses this option but never applies it,
    backbone_blocks.py:127; we implement the documented intent.)"""
    base = {"backbone": {
        "type": "resnet", "input_shape": ["?", "?", 3], "filters": 4,
        "no_layers": 2, "kernel_size": 3, "block_kernels": [3],
        "block_filters": [4], "activation": "relu", "batchnorm": False,
        "value_range": [0, 255], "kernel_regularizer": "l1",
        "kernel_initializer": "glorot_normal"},
        "denoiser": {"use_bias": False, "output_channels": 3}}
    with_ms = copy.deepcopy(base)
    with_ms["backbone"]["add_mean_sigma_normalization"] = True

    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 255, (1, 32, 32, 3)).astype(np.float32))
    outs = []
    for cfg in (base, with_ms):
        hydra = model_builder(cfg).hydra
        vs = hydra.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        outs.append(np.asarray(hydra.apply(vs, x, train=False)[0]))
    assert outs[0].shape == outs[1].shape
    assert not np.allclose(outs[0], outs[1])


def test_bf16_train_mode_with_stochastic_depth():
    """bfloat16 compute must survive train-mode dropout paths: a
    numpy-scalar drop rate used to strong-type flax Dropout's keep_prob
    and crash lax.select with mixed dtypes (found training the flagship
    in bf16 on TPU)."""
    cfg = {"backbone": {
        "type": "unet_laplacian", "input_shape": ["?", "?", 3],
        "depth": 2, "width": 2, "filters": 4,
        "encoder_kernel_size": 3, "decoder_kernel_size": 3,
        "gaussian_kernel_size": 2, "activation": "leaky_relu_01",
        "upsample_type": "upsample_nearest_conv2d",
        "downsample_type": "strides",
        "use_bn": False, "use_ln": True, "use_bias": False,
        "use_laplacian_averaging": True, "depth_drop_rate": 0.3,
        "multiple_scale_outputs": False,
        "kernel_regularizer": "l2", "kernel_initializer": "glorot_normal"},
        "denoiser": {"filters": 4, "use_bias": False, "output_channels": 3}}
    hydra = model_builder(cfg, dtype=jnp.bfloat16).hydra
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 255, (2, 32, 32, 3)).astype(np.float32))
    vs = hydra.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    vs = {k: v for k, v in vs.items() if k in ("params", "batch_stats")}
    out = hydra.apply(vs, x, train=True,
                      rngs={"dropout": jax.random.PRNGKey(1)},
                      mutable=["losses"])[0][0]
    assert out.shape == (2, 32, 32, 3)


def test_config_key_audit(caplog):
    """Unknown backbone keys warn; every packaged config is clean."""
    import logging
    from blind_image_denoising_tpu.models.hydra import backbone_from_config

    base = {"type": "resnet", "input_shape": ["?", "?", 3], "filters": 4,
            "no_layers": 1, "block_kernels": [3], "block_filters": [4]}

    with caplog.at_level(logging.WARNING, logger="bfcnn_tpu"):
        backbone_from_config(dict(base, definitely_not_a_key=1))
    assert any("definitely_not_a_key" in r.message for r in caplog.records)
    caplog.clear()

    with caplog.at_level(logging.WARNING, logger="bfcnn_tpu"):
        backbone_from_config(dict(base, add_gradient_dropout=True))
    assert any("NO-OP" in r.message for r in caplog.records)
    caplog.clear()

    with caplog.at_level(logging.WARNING, logger="bfcnn_tpu"):
        for name in CONFIG_NAMES:
            backbone_from_config(
                dict(bid.CONFIGS_DICT[name]["model"]["backbone"],
                     input_shape=["?", "?", 3]))
    ignored = [r.message for r in caplog.records if "IGNORED" in r.message]
    assert not ignored, f"packaged configs carry unknown keys: {ignored}"


def test_block_list_length_mismatch_raises():
    """Regression: a block_activation/groups/depthwise/regularizer list of
    the wrong length must raise (reference backbone_resnet.py:122-126), not
    silently fall back to all-defaults and build a different model."""
    from blind_image_denoising_tpu.models import ResnetBackbone
    cfg = dict(
        type="resnet", filters=4, no_layers=1, kernel_size=3,
        block_kernels=[1, 3, 1], block_filters=[4, 4, 4],
        block_activation=["relu", "relu"],  # one entry short
        activation="relu", batchnorm=False,
        kernel_regularizer="l1", kernel_initializer="glorot_normal")
    m = ResnetBackbone(config=cfg)
    with pytest.raises(ValueError, match="block_activation"):
        m.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 3)))


def test_unknown_key_warning_deduped(caplog):
    """Regression: backbone_from_config runs inside the traced Hydra body
    (re-traced per serving shape bucket) — a misconfigured key must warn
    once per process, not once per trace."""
    import logging
    from blind_image_denoising_tpu.models.hydra import backbone_from_config

    base = {"type": "resnet", "input_shape": ["?", "?", 3], "filters": 4,
            "no_layers": 1, "block_kernels": [3], "block_filters": [4],
            "dedupe_probe_key": 1}
    with caplog.at_level(logging.WARNING, logger="bfcnn_tpu"):
        for _ in range(3):
            backbone_from_config(dict(base))
    hits = [r for r in caplog.records if "dedupe_probe_key" in r.message]
    assert len(hits) == 1


def test_unet_laplacian_per_level_width_and_kernels():
    """TPU extension: width / encoder_kernel_size / decoder_kernel_size
    accept per-level lists (lean full-res level, full capacity deeper —
    the docs/PERF.md architectural lever). Scalar configs are unchanged;
    wrong-length lists raise."""
    base = {"backbone": {
        "type": "unet_laplacian", "input_shape": ["?", "?", 3],
        "depth": 3, "width": [1, 2, 2], "filters": 4,
        "encoder_kernel_size": [3, 5, 5], "decoder_kernel_size": [3, 3, 5],
        "gaussian_kernel_size": 2, "activation": "leaky_relu_01",
        "upsample_type": "upsample_nearest_conv2d",
        "downsample_type": "conv2d", "use_bn": False, "use_ln": True,
        "use_bias": False, "use_laplacian_averaging": True,
        "multiple_scale_outputs": True, "value_range": [0, 255],
        "kernel_regularizer": "l2", "kernel_initializer": "glorot_normal"},
        "denoiser": {"filters": 4, "use_bias": False, "output_channels": 3}}
    hydra = model_builder(base).hydra
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    vs = hydra.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    outs = hydra.apply(vs, x, train=False)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 3), (1, 16, 16, 3), (1, 8, 8, 3)]
    p = vs["params"]["backbone"]
    # level 0 has 1 encoder block, level 1 has 2
    assert "encoder_0_0" in p and "encoder_0_1" not in p
    assert "encoder_1_0" in p and "encoder_1_1" in p
    # level-0 encoder depthwise kernel is 3x3; level-1 is 5x5
    assert p["encoder_0_0"]["conv_1"]["kernel"].shape[:2] == (3, 3)
    assert p["encoder_1_0"]["conv_1"]["kernel"].shape[:2] == (5, 5)
    # level-0 decoder blocks use the 3x3 override
    assert p["decoder_0_0"]["conv_1"]["kernel"].shape[:2] == (3, 3)

    bad = copy.deepcopy(base)
    bad["backbone"]["width"] = [1, 2]
    with pytest.raises(ValueError, match="one entry per level"):
        model_builder(bad).hydra.init(
            {"params": jax.random.PRNGKey(0)}, x, train=False)


def test_space_to_depth_stem_contract():
    """The MXU-oriented s2d stem (VERDICT r3 #3): pixel-unshuffle at the
    stem, pixel-shuffle each scale output back — the backbone's external
    scale contract (finest at H, scale k at H/2^k) and the any-size
    Denoiser contract are unchanged; bad channel divisibility raises."""
    import copy
    import numpy as np
    import pytest
    import jax
    import jax.numpy as jnp
    import blind_image_denoising_tpu as bid
    from blind_image_denoising_tpu.models.hydra import model_builder
    from blind_image_denoising_tpu.ops.resize import (
        depth_to_space, space_to_depth)

    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(size=(2, 8, 12, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x, 2), 2)), np.asarray(x))

    cfg = copy.deepcopy(bid.CONFIGS_DICT["unet_laplacian_v6_tpu"]["model"])
    cfg["backbone"].update(space_to_depth_stem=2, filters=8, depth=2,
                           width=1, encoder_kernel_size=3,
                           decoder_kernel_size=3,
                           use_self_attention=False)
    cfg["denoiser"]["filters"] = 8
    res = model_builder(cfg)
    v = res.hydra.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 32, 32, 3)), train=False)
    v = {k: val for k, val in v.items() if k in ("params", "batch_stats")}
    outs = res.hydra.apply(v, jnp.zeros((2, 32, 32, 3)), train=False)
    assert [o.shape for o in outs] == [(2, 32, 32, 3), (2, 16, 16, 3)]

    from blind_image_denoising_tpu.inference.denoiser import Denoiser
    d = Denoiser(res.hydra, v, pad_multiple=8)
    img = np.random.default_rng(1).integers(0, 256, (30, 44, 3), np.uint8)
    out = d(img)
    assert out.shape == img.shape and out.dtype == np.uint8

    bad = copy.deepcopy(cfg)
    bad["backbone"]["filters"] = 6   # 6 % 4 != 0
    with pytest.raises(ValueError, match="divisible"):
        res_bad = model_builder(bad)
        res_bad.hydra.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 16, 16, 3)), train=False)

    with pytest.raises(ValueError, match="space_to_depth_stem"):
        worse = copy.deepcopy(cfg)
        worse["backbone"]["space_to_depth_stem"] = 1
        model_builder(worse).hydra.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 16, 16, 3)), train=False)
