"""`.keras` archive emission (inference/keras_export.py).

The reference's build/export paths save the hydra as ``model_hydra.keras``
(reference build.py:35-38, export_model.py:106-110, constants.py:32); this
repo emits the same artifact class: a self-contained Keras archive whose
weights are the Flax leaves and whose forward reproduces the JAX hydra.

TensorFlow import costs ~30 s, so everything here lives in the slow tier
with the other TF-dependent emission tests.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

CFG = {"backbone": {
    "type": "resnet", "input_shape": ["?", "?", 3], "filters": 4,
    "no_layers": 1, "kernel_size": 3, "block_kernels": [3],
    "block_filters": [4], "activation": "relu", "batchnorm": False,
    "value_range": [0, 255], "kernel_regularizer": "l1",
    "kernel_initializer": "glorot_normal"},
    "denoiser": {"use_bias": False, "output_channels": 3}}


def _tiny_hydra():
    from blind_image_denoising_tpu.models.hydra import model_builder
    hydra = model_builder(CFG).hydra
    variables = hydra.init({"params": jax.random.PRNGKey(7)},
                           jnp.zeros((1, 32, 32, 3)), train=False)
    return hydra, {k: v for k, v in variables.items()
                   if k in ("params", "batch_stats")}


@pytest.mark.slow
def test_keras_round_trip(tmp_path):
    """save_hydra_keras -> tf_keras.models.load_model reproduces the
    native forward on multiple (any-size) inputs, with the trained
    weights restored from inside the archive."""
    pytest.importorskip("tf_keras")
    from blind_image_denoising_tpu.inference.keras_export import (
        load_hydra_keras, save_hydra_keras)

    hydra, variables = _tiny_hydra()
    path = tmp_path / "model_hydra.keras"
    save_hydra_keras(CFG, variables, str(path))
    assert path.is_file() and path.stat().st_size > 1000

    fwd = load_hydra_keras(str(path))
    rng = np.random.default_rng(0)
    for shape in [(1, 32, 32, 3), (2, 48, 64, 3)]:
        x = rng.uniform(0, 255, shape).astype(np.float32)
        ref = [np.asarray(o) for o in hydra.apply(variables, x, train=False)]
        out = fwd(x)
        assert len(out) == len(ref)
        for o, r in zip(out, ref):
            np.testing.assert_allclose(o, r, atol=1e-3, rtol=1e-4)


@pytest.mark.slow
def test_keras_archive_is_inspectable_zip(tmp_path):
    """The artifact is a genuine .keras zip: config names the hydra
    layer + model config, weights are stored per Flax path (what netron
    reads)."""
    pytest.importorskip("tf_keras")
    import zipfile
    from blind_image_denoising_tpu.inference.keras_export import (
        save_hydra_keras)

    _, variables = _tiny_hydra()
    path = tmp_path / "model_hydra.keras"
    save_hydra_keras(CFG, variables, str(path))

    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        assert any(n.endswith("config.json") for n in names)
        assert any(n.endswith(".h5") or "weights" in n for n in names)
        cfg = json.loads(z.read(
            [n for n in names if n.endswith("config.json")][0]))
    blob = json.dumps(cfg)
    assert "HydraLayer" in blob and "model_config" in blob


@pytest.mark.slow
def test_keras_rejects_mismatched_variables(tmp_path):
    pytest.importorskip("tf_keras")
    from blind_image_denoising_tpu.inference.keras_export import (
        save_hydra_keras)

    _, variables = _tiny_hydra()
    wrong = dict(CFG)
    wrong["backbone"] = dict(CFG["backbone"], filters=8,
                             block_filters=[8])
    with pytest.raises(ValueError, match="do not match"):
        save_hydra_keras(wrong, variables,
                         str(tmp_path / "model_hydra.keras"))


@pytest.mark.slow
def test_build_cli_keras_flag(tmp_path):
    """--keras on the build CLI writes model_hydra.keras next to the
    params (the reference build artifact, reference build.py:35-38)."""
    pytest.importorskip("tf_keras")
    from blind_image_denoising_tpu.build import main

    cfg = {"model": CFG,
           "dataset": {"input_shape": [32, 32, 3]}}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    out = tmp_path / "out"
    assert main(["--pipeline-config", str(cfg_path),
                 "--output-directory", str(out), "--keras"]) == 0
    assert (out / "params.msgpack").is_file()
    assert (out / "model_structure.json").is_file()
    assert (out / "model_hydra.keras").is_file()
