"""int8 post-training quantization (ops/quant.py, inference/quantize.py).

The reference ships full-int8 TFLite artifacts as its deployment form;
this is the TPU-native PTQ equivalent. Correctness here is CPU-tested;
the 2.23x throughput claim is measured on real TPU (docs/PERF.md)."""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import blind_image_denoising_tpu as bid
from blind_image_denoising_tpu.models.hydra import model_builder
from blind_image_denoising_tpu.inference.quantize import calibrate
from blind_image_denoising_tpu.inference.denoiser import Denoiser
from blind_image_denoising_tpu.ops.quant import (
    INT8_MAX, quant_mode, quantize, weight_scales)


def tiny_flagship():
    cfg = copy.deepcopy(bid.CONFIGS_DICT["unet_laplacian_v6"])
    bb = cfg["model"]["backbone"]
    bb.update(depth=2, width=1, filters=8)
    cfg["model"]["denoiser"]["filters"] = 8
    r = model_builder(cfg["model"])
    v = r.hydra.init({"params": jax.random.PRNGKey(0)},
                     jnp.zeros((1, 32, 32, 3)), train=False)
    return r.hydra, v


@pytest.fixture(scope="module")
def calibrated():
    hydra, v = tiny_flagship()
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 255, (4, 64, 64, 3)).astype(np.float32)
    qv = calibrate(hydra, v, imgs, batch_size=2)
    return hydra, v, qv


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (64, 64)).astype(np.float32))
    scale = jnp.max(jnp.abs(x)) / INT8_MAX
    x8 = quantize(x, scale)
    assert x8.dtype == jnp.int8
    err = np.abs(np.asarray(x8, np.float32) * float(scale) - np.asarray(x))
    assert err.max() <= float(scale) / 2 + 1e-7


def test_weight_scales_per_output_channel():
    k = np.zeros((3, 3, 4, 8), np.float32)
    k[..., 0] = 1.0
    k[..., 3] = 0.25
    s = np.asarray(weight_scales(jnp.asarray(k)))
    assert s.shape == (8,)
    np.testing.assert_allclose(s[0], 1.0 / INT8_MAX, rtol=1e-6)
    np.testing.assert_allclose(s[3], 0.25 / INT8_MAX, rtol=1e-6)


def test_calibrate_adds_quant_collection(calibrated):
    _, v, qv = calibrated
    assert "quant" in qv and "quant" not in v
    leaves = jax.tree_util.tree_leaves(qv["quant"])
    assert len(leaves) > 10  # every ConvBlock in the tiny flagship
    assert all(float(s) > 0 for s in leaves)


def test_int8_forward_tracks_float(calibrated):
    hydra, v, qv = calibrated
    rng = np.random.default_rng(2)
    # a structured scene, not pure noise — PTQ targets real images
    g = np.linspace(0, 255, 64)[None, :, None] * np.ones((64, 1, 3))[None]
    x = jnp.asarray(np.clip(g + rng.normal(0, 10, (1, 64, 64, 3)),
                            0, 255).astype(np.float32))
    y_f = np.asarray(hydra.apply(v, x, train=False)[0])
    with quant_mode("int8"):
        y_q = np.asarray(hydra.apply(qv, x, train=False)[0])
    assert y_q.shape == y_f.shape
    # random-init tiny model: just require the int8 graph to track the
    # float graph within a few gray levels (trained-model deltas are
    # tighter — docs/QUALITY_BENCHMARK.md)
    assert np.abs(y_q - y_f).mean() < 8.0
    # and NOT be bitwise identical (the int8 path actually ran)
    assert np.abs(y_q - y_f).mean() > 0.0


def test_int8_without_scales_falls_back(calibrated):
    hydra, v, _ = calibrated
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    with quant_mode("int8"):  # no 'quant' collection -> float path
        y = np.asarray(hydra.apply(v, x, train=False)[0])
    y_f = np.asarray(hydra.apply(v, x, train=False)[0])
    np.testing.assert_allclose(y, y_f, atol=1e-6)


def test_exclude_regex_keeps_layers_float(calibrated):
    hydra, v, _ = calibrated
    rng = np.random.default_rng(3)
    imgs = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    qv_all = calibrate(hydra, v, imgs, batch_size=2)
    qv_part = calibrate(hydra, v, imgs, batch_size=2,
                        exclude=(r"denoiser_head",))
    n_all = len(jax.tree_util.tree_leaves(qv_all["quant"]))
    n_part = len(jax.tree_util.tree_leaves(qv_part["quant"]))
    assert n_part < n_all
    import flax
    flat = flax.traverse_util.flatten_dict(qv_part["quant"], sep="/")
    assert not any("denoiser_head" in k for k in flat)


def test_denoiser_quant_contract(calibrated):
    hydra, _, qv = calibrated
    den = Denoiser(hydra, qv, quant=True)
    img = np.random.default_rng(4).integers(0, 255, (40, 56, 3), np.uint8)
    out = den(img)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_denoiser_quant_requires_scales(calibrated):
    hydra, v, _ = calibrated
    with pytest.raises(ValueError, match="calibrated scales"):
        Denoiser(hydra, v, quant=True)


def test_quant_mode_validation():
    with pytest.raises(ValueError, match="unknown quant mode"):
        with quant_mode("int4"):
            pass


def test_quantized_artifact_roundtrip(tmp_path, calibrated):
    """Exported quant.msgpack scales reload into a working int8 Denoiser
    through save_params_artifact + load_exported_model + load_model."""
    import flax.serialization
    import blind_image_denoising_tpu as bid
    from blind_image_denoising_tpu.inference.export import (
        QUANT_FILE, load_exported_model, save_params_artifact)

    hydra, v, qv = calibrated
    cfg = copy.deepcopy(bid.CONFIGS_DICT["unet_laplacian_v6"])
    bb = cfg["model"]["backbone"]
    bb.update(depth=2, width=1, filters=8)
    cfg["model"]["denoiser"]["filters"] = 8
    cfg["dataset"]["input_shape"] = [64, 64, 3]

    save_params_artifact(v["params"], cfg, tmp_path)
    with open(tmp_path / QUANT_FILE, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(qv["quant"]))

    den = load_exported_model(tmp_path, quant=True)
    img = np.random.default_rng(5).integers(0, 255, (32, 48, 3), np.uint8)
    out = den(img)
    assert out.shape == img.shape and out.dtype == np.uint8

    # the int8 path actually engaged: differs from the float artifact
    den_f = bid.load_model(str(tmp_path))
    assert np.abs(out.astype(np.float32) -
                  den_f(img).astype(np.float32)).mean() > 0.0

    # quant load via the public API works too
    den2 = bid.load_model(str(tmp_path), quant=True)
    np.testing.assert_array_equal(den2(img), out)


def test_quant_load_requires_scales_file(tmp_path, calibrated):
    import copy as _copy
    import blind_image_denoising_tpu as bid
    from blind_image_denoising_tpu.inference.export import (
        load_exported_model, save_params_artifact)
    hydra, v, _ = calibrated
    cfg = _copy.deepcopy(bid.CONFIGS_DICT["unet_laplacian_v6"])
    cfg["model"]["backbone"].update(depth=2, width=1, filters=8)
    cfg["model"]["denoiser"]["filters"] = 8
    save_params_artifact(v["params"], cfg, tmp_path)
    with pytest.raises(ValueError, match="quant.msgpack"):
        load_exported_model(tmp_path, quant=True)


def test_packaged_highnoise_quant_load():
    """The shipped pretrained artifact carries calibrated int8 scales:
    bid.load_model(name, quant=True) works out of the box."""
    import blind_image_denoising_tpu as bid
    if "unet_laplacian_v56_highnoise" not in bid.models:
        pytest.skip("packaged pretrained artifact absent")
    den = bid.load_model("unet_laplacian_v56_highnoise", quant=True)
    img = np.random.default_rng(6).integers(0, 255, (48, 64, 3), np.uint8)
    out = den(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    # differs from the float path (int8 actually engaged)
    den_f = bid.load_model("unet_laplacian_v56_highnoise")
    assert np.abs(out.astype(np.float32) -
                  den_f(img).astype(np.float32)).mean() > 0.0
