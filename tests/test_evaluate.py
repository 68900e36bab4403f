"""Evaluation harness tests."""

import numpy as np
import pytest

from blind_image_denoising_tpu.evaluate import (
    apply_degradations, degradation_sweep, load_eval_images, noise_sweep,
    parse_degradation_spec)
from blind_image_denoising_tpu.images import load_evaluation_images


def test_noise_sweep_identity_denoiser():
    """An identity 'denoiser' must show mae_denoised == mae_noisy (after
    uint8 rounding) and zero error at std 0."""
    images = load_evaluation_images(64).astype(np.float32)

    records = noise_sweep(lambda x: x, images, stds=(0, 20))
    by_std = {r["noise_std"]: r for r in records}
    assert by_std[0.0]["mae_denoised"] < 1e-6
    assert abs(by_std[20.0]["mae_denoised"]
               - by_std[20.0]["mae_noisy"]) < 1e-3
    assert by_std[20.0]["mae_noisy"] > 10.0


def test_noise_sweep_perfect_denoiser():
    """A 'denoiser' that returns the clean images shows improvement on
    every metric."""
    images = load_evaluation_images(64).astype(np.float32)
    clean_uint8 = np.clip(np.round(images), 0, 255).astype(np.uint8)

    records = noise_sweep(lambda x: clean_uint8, images, stds=(20,))
    r = records[0]
    assert r["mae_denoised"] < r["mae_noisy"]
    assert r["psnr_denoised"] > r["psnr_noisy"]
    assert r["ssim_denoised"] > r["ssim_noisy"]


def test_packaged_eval_images_deterministic():
    a = load_evaluation_images(64)
    b = load_evaluation_images(64)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (4, 64, 64, 3)
    assert a.min() >= 0 and a.max() <= 255


def test_parse_degradation_spec():
    assert parse_degradation_spec("blur:1.5+noise:25") == [
        ("blur", 1.5), ("noise", 25.0)]
    assert parse_degradation_spec("JPEG:50") == [("jpeg", 50.0)]
    with pytest.raises(ValueError, match="unknown degradation"):
        parse_degradation_spec("sharpen:2")
    with pytest.raises(ValueError, match="needs a :value"):
        parse_degradation_spec("blur")
    with pytest.raises(ValueError, match="empty step"):
        parse_degradation_spec("blur:1++noise:2")
    # value ranges: a bad value must raise, not feed NaN/garbage to the
    # sweep (posterize:0 would divide by zero; holes is a probability)
    for bad in ("posterize:0", "holes:1.0", "holes:1.5", "noise:-1",
                "jpeg:0", "jpeg:101", "blur:0", "blur:nan"):
        with pytest.raises(ValueError, match="out of range"):
            parse_degradation_spec(bad)
    assert parse_degradation_spec("holes:0.99+posterize:1") == [
        ("holes", 0.99), ("posterize", 1.0)]


def test_apply_degradations_deterministic_and_ordered():
    images = load_evaluation_images(64).astype(np.float32)

    a = apply_degradations(images, "blur:1.5+noise:25", seed=3)
    b = apply_degradations(images, "blur:1.5+noise:25", seed=3)
    np.testing.assert_array_equal(a, b)  # (spec, seed) reproducible
    c = apply_degradations(images, "blur:1.5+noise:25", seed=4)
    assert np.abs(a - c).mean() > 1.0  # the noise step is keyed on seed

    # chains apply left to right: noise-then-blur smooths the noise,
    # blur-then-noise leaves it intact — distinguishable by total error
    nb = apply_degradations(images, "noise:25+blur:1.5", seed=0)
    bn = apply_degradations(images, "blur:1.5+noise:25", seed=0)
    assert np.abs(bn - images).mean() > np.abs(nb - images).mean() + 1.0

    # each step degrades: MAE > 0 and within [0, 255]
    for spec in ("jpeg:40", "posterize:32", "holes:0.1"):
        out = apply_degradations(images, spec, seed=0)
        assert np.abs(out - images).mean() > 0.5, spec
        assert out.min() >= 0 and out.max() <= 255


def test_degradation_sweep_identity_and_perfect():
    images = load_evaluation_images(64).astype(np.float32)
    clean_uint8 = np.clip(np.round(images), 0, 255).astype(np.uint8)

    ident = degradation_sweep(lambda x: x, images,
                              ["jpeg:50", "blur:1.0+noise:20"])
    for r in ident:
        assert abs(r["mae_restored"] - r["mae_corrupt"]) < 1e-3

    perfect = degradation_sweep(lambda x: clean_uint8, images, ["jpeg:50"])
    r = perfect[0]
    assert r["mae_restored"] < r["mae_corrupt"]
    assert r["psnr_restored"] > r["psnr_corrupt"]
    assert r["ssim_restored"] > r["ssim_corrupt"]


def test_evaluate_cli_degradations(tmp_path, capsys):
    """The --degradations flag drives the restoration sweep end-to-end
    through load_model on a tiny exported artifact."""
    import copy
    import json
    from conftest import TINY_RESNET_MODEL, tiny_resnet_hydra
    from blind_image_denoising_tpu.evaluate import main as eval_main
    from blind_image_denoising_tpu.inference.export import (
        save_params_artifact)

    _, variables = tiny_resnet_hydra()
    artifact = save_params_artifact(
        variables["params"], {"model": copy.deepcopy(TINY_RESNET_MODEL)},
        tmp_path / "artifact")
    rc = eval_main(["--model", str(artifact), "--size", "32",
                    "--limit", "2", "--degradations",
                    "posterize:64,holes:0.2+noise:10"])
    assert rc == 0
    records = json.loads(capsys.readouterr().out)
    assert [r["degradation"] for r in records] == [
        "posterize:64", "holes:0.2+noise:10"]
    assert all(r["mae_corrupt"] > 0 for r in records)


def test_load_eval_images_directory(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
                        ).save(tmp_path / f"{i}.png")
    imgs = load_eval_images(str(tmp_path), size=32)
    assert imgs.shape == (2, 32, 32, 3)
