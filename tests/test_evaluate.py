"""Evaluation harness tests."""

import numpy as np

from blind_image_denoising_tpu.evaluate import noise_sweep, load_eval_images
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


def test_load_eval_images_directory(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
                        ).save(tmp_path / f"{i}.png")
    imgs = load_eval_images(str(tmp_path), size=32)
    assert imgs.shape == (2, 32, 32, 3)
