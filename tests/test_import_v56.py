"""Native v5.6 pretrained weight import: structural + numerical parity
against the artifact's own TFLite graph (SURVEY §7.7 — 'weight import ...
with bitwise-close output checks'; residual diff is the TFLite's int8
dynamic-range weight quantization, the native path carries the original
float32 weights)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

D = "/root/reference/bfcnn/pretrained/unet_laplacian_v5.6/"

needs_artifact = pytest.mark.skipif(
    not os.path.isfile(D + "model_hydra.keras"),
    reason="reference pretrained artifact not mounted")


@pytest.fixture(scope="module")
def native():
    from blind_image_denoising_tpu.inference.import_v56 import (
        build_pretrained_v56)
    return build_pretrained_v56(D + "model_hydra.keras")


@needs_artifact
def test_import_structure_and_param_count(native):
    model, variables = native
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    assert n == 334_976  # the artifact's exact parameter count


@needs_artifact
def test_native_matches_tflite_graph(native):
    from blind_image_denoising_tpu.inference.tflite import (
        load_tflite_denoiser)
    model, variables = native
    x = np.random.default_rng(0).integers(0, 256, (1, 64, 64, 3),
                                          dtype=np.uint8)
    out = model.apply(variables, jnp.asarray(x, jnp.float32))[0]
    native_u8 = np.clip(np.round(np.asarray(out)), 0, 255)
    ref = np.asarray(load_tflite_denoiser(
        D + "denoiser_model.tflite")(x)).astype(np.float32)
    diff = np.abs(native_u8 - ref)
    # int8 weight-quantization noise bound
    assert diff.mean() < 2.0
    assert np.percentile(diff, 99) <= 8


@needs_artifact
def test_native_denoises(native):
    model, variables = native
    g = np.linspace(0, 255, 64)[None, :, None] * np.ones((64, 1, 3))[None]
    clean = np.broadcast_to(np.clip(g, 0, 255),
                            (1, 64, 64, 3)).astype(np.float32)
    rng = np.random.default_rng(1)
    for std in (15, 30):
        noisy = np.clip(clean + rng.normal(0, std, clean.shape),
                        0, 255).astype(np.float32)
        den = np.asarray(model.apply(variables, jnp.asarray(noisy))[0])
        assert np.abs(den - clean).mean() < 0.5 * np.abs(noisy - clean).mean()


@needs_artifact
def test_native_multiscale_outputs(native):
    model, variables = native
    x = jnp.full((1, 32, 32, 3), 128.0)
    outs = model.apply(variables, x, all_scales=True)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 3), (1, 16, 16, 3), (1, 8, 8, 3)]


@needs_artifact
def test_load_model_prefers_native_import():
    import blind_image_denoising_tpu as bid
    den = bid.load_model(D)
    img = np.random.default_rng(0).integers(0, 256, (40, 56, 3),
                                            dtype=np.uint8)
    out = den(img)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_load_default_denoiser_packaged():
    """The packaged registry's default path works without any external
    artifact (reference __init__.py:119-122 contract)."""
    import numpy as np
    import blind_image_denoising_tpu as bid
    den = bid.load_default_denoiser()
    img = np.random.default_rng(0).integers(0, 255, (40, 56, 3), np.uint8)
    out = den(img)
    assert out.shape == img.shape and out.dtype == np.uint8
