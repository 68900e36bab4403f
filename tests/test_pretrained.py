"""Pretrained-model acceptance tests — the analog of the reference's
test_pretrained.py:23-80 quality gate: the shipped pretrained denoiser must
beat the noisy input on PSNR, SSIM and MAE across a noise sweep.

Runs the reference's actual shipped TFLite weights through the JAX graph
executor (inference/tflite.py). Skipped when the reference artifact isn't
mounted."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

REFERENCE_TFLITE = ("/root/reference/bfcnn/pretrained/unet_laplacian_v5.6/"
                    "denoiser_model.tflite")
KITTI_DIR = "/root/reference/images/test/kitti/files"

needs_artifact = pytest.mark.skipif(
    not os.path.isfile(REFERENCE_TFLITE),
    reason="reference pretrained artifact not mounted")


@pytest.fixture(scope="module")
def denoiser():
    from blind_image_denoising_tpu.inference.tflite import load_tflite_denoiser
    return load_tflite_denoiser(REFERENCE_TFLITE)


@needs_artifact
def test_executor_output_contract(denoiser):
    x = np.random.default_rng(0).integers(0, 256, (1, 64, 64, 3),
                                          dtype=np.uint8)
    y = np.asarray(denoiser(x))
    assert y.shape == x.shape and y.dtype == np.uint8


@needs_artifact
def test_pretrained_beats_noisy_synthetic(denoiser):
    """MAE/PSNR/SSIM all improve at std ∈ {10, 20, 30} on a synthetic
    gradient scene."""
    from blind_image_denoising_tpu.ops.losses import psnr
    from blind_image_denoising_tpu.ops.ssim import ssim

    g = np.linspace(0, 255, 64)[None, :, None] * np.ones((64, 1, 3))[None]
    clean = np.broadcast_to(np.clip(g, 0, 255),
                            (1, 64, 64, 3)).astype(np.float32)
    rng = np.random.default_rng(1)
    for std in (10, 20, 30):
        noisy = np.clip(np.round(clean + rng.normal(0, std, clean.shape)),
                        0, 255).astype(np.uint8)
        den = np.asarray(denoiser(noisy)).astype(np.float32)
        assert np.abs(den - clean).mean() < np.abs(noisy - clean).mean()
        assert float(psnr(jnp.asarray(clean), jnp.asarray(den))) > \
            float(psnr(jnp.asarray(clean), jnp.asarray(noisy, jnp.float32)))
        assert float(ssim(jnp.asarray(clean), jnp.asarray(den)).mean()) > \
            float(ssim(jnp.asarray(clean),
                       jnp.asarray(noisy, jnp.float32)).mean())


@needs_artifact
@pytest.mark.skipif(not os.path.isdir(KITTI_DIR),
                    reason="KITTI test frames not mounted")
def test_pretrained_beats_noisy_kitti(denoiser):
    """The reference's de-facto acceptance test on a real KITTI frame."""
    from blind_image_denoising_tpu.data.file_operations import load_image

    files = sorted(os.listdir(KITTI_DIR))[:1]
    rng = np.random.default_rng(0)
    for f in files:
        clean = load_image(os.path.join(KITTI_DIR, f), num_channels=3)[None]
        clean = clean[:, :128, :256]  # crop to keep CPU compile fast
        for std in (10, 25):
            noisy = np.clip(np.round(clean + rng.normal(0, std, clean.shape)),
                            0, 255).astype(np.uint8)
            den = np.asarray(denoiser(noisy)).astype(np.float32)
            assert np.abs(den - clean).mean() < np.abs(noisy - clean).mean()


def test_shipped_finetuned_artifact():
    """The package ships its own fine-tuned pretrained model
    (unet_laplacian_v56_highnoise): loads by registry name, denoises
    high-sigma noise."""
    import blind_image_denoising_tpu as bid
    if "unet_laplacian_v56_highnoise" not in bid.models:
        pytest.skip("shipped artifact not present")
    den = bid.load_model("unet_laplacian_v56_highnoise")
    g = np.linspace(0, 255, 64)[None, :, None] * np.ones((64, 1, 3))[None]
    clean = np.broadcast_to(np.clip(g, 0, 255),
                            (1, 64, 64, 3)).astype(np.float32)
    noisy = np.clip(clean + np.random.default_rng(1)
                    .normal(0, 60, clean.shape), 0, 255).astype(np.uint8)
    out = np.asarray(den(noisy)).astype(np.float32)
    assert np.abs(out - clean).mean() < 0.25 * np.abs(noisy - clean).mean()


V56_KERAS = ("/root/reference/bfcnn/pretrained/unet_laplacian_v5.6/"
             "model_hydra.keras")


def _kitti_crops(width: int) -> np.ndarray:
    from blind_image_denoising_tpu.data.file_operations import \
        load_corner_crops
    crops = load_corner_crops(KITTI_DIR, height=256, width=width)
    assert len(crops) >= 10, "expected the full KITTI test set"
    return crops


@pytest.mark.skipif(not os.path.isfile(V56_KERAS),
                    reason="reference pretrained artifact not mounted")
@pytest.mark.skipif(not os.path.isdir(KITTI_DIR),
                    reason="KITTI test frames not mounted")
@pytest.mark.slow
def test_acceptance_gate_all_kitti_full_sweep():
    """Reference-strength acceptance gate (test_pretrained.py:63-80 parity):
    the FULL product — every mounted KITTI frame at every std in
    {10,15,20,25,30}; PSNR AND SSIM AND MAE must all improve. One batched
    forward per std over the native float32 import.

    Default suite runs the full product on 256x256 center crops (~5 min
    CPU); BID_FULL_ACCEPTANCE=1 widens the crops to the 256x512 protocol
    (~20 min CPU — verified passing 2026-08-17)."""
    import blind_image_denoising_tpu as bid
    from blind_image_denoising_tpu.ops.losses import psnr
    from blind_image_denoising_tpu.ops.ssim import ssim

    den = bid.load_model(os.path.dirname(V56_KERAS))
    width = 512 if os.environ.get("BID_FULL_ACCEPTANCE") == "1" else 256
    clean_all = _kitti_crops(width)

    stds = (10, 15, 20, 25, 30)
    rng = np.random.default_rng(0)
    for std in stds:
        clean_j = jnp.asarray(clean_all)
        noisy = np.clip(
            np.round(clean_all + rng.normal(0, std, clean_all.shape)),
            0, 255).astype(np.uint8)
        noisy_f = jnp.asarray(noisy, jnp.float32)
        out = jnp.asarray(np.asarray(den(noisy)), jnp.float32)

        mae_n = float(jnp.abs(noisy_f - clean_j).mean())
        mae_d = float(jnp.abs(out - clean_j).mean())
        assert mae_d < mae_n, f"MAE not improved at std {std}"
        assert float(psnr(clean_j, out)) > float(psnr(clean_j, noisy_f)), \
            f"PSNR not improved at std {std}"
        assert float(ssim(clean_j, out).mean()) > \
            float(ssim(clean_j, noisy_f).mean()), \
            f"SSIM not improved at std {std}"


@pytest.mark.slow  # full-frame x multi-sigma gate: ~4-5 min each
@pytest.mark.skipif(not os.path.isdir(KITTI_DIR),
                    reason="KITTI test frames not mounted")
def test_shipped_scratch_resnet_kitti_gate():
    """The packaged FROM-SCRATCH artifact (resnet_depthwise_scratch —
    the README model family trained on the 35 mounted frames,
    docs/TRAINING_DEMO.md round 3) gated on real KITTI frames: must beat
    noisy on MAE at every README-sweep std and stay within striking
    distance of its recorded table (margin absorbs frame-set/crop
    differences vs the 4-held-out-frame protocol)."""
    import blind_image_denoising_tpu as bid
    if "resnet_depthwise_scratch" not in bid.models:
        pytest.skip("shipped artifact not present")
    den = bid.load_model("resnet_depthwise_scratch")

    # (sigma, recorded MAE_denoised) from the training run's sweep
    recorded = {10: 5.49, 20: 6.84, 40: 9.15, 80: 13.25}
    clean_all = _kitti_crops(256)
    rng = np.random.default_rng(0)
    for std, rec in recorded.items():
        clean_j = jnp.asarray(clean_all)
        n = np.clip(rng.normal(0, std, clean_all.shape), -2 * std, 2 * std)
        noisy = np.clip(np.round(clean_all + n), 0, 255).astype(np.uint8)
        out = jnp.asarray(np.asarray(den(noisy)), jnp.float32)
        mae_n = float(jnp.abs(jnp.asarray(noisy, jnp.float32)
                              - clean_j).mean())
        mae_d = float(jnp.abs(out - clean_j).mean())
        assert mae_d < mae_n, f"std {std}: {mae_d:.2f} vs noisy {mae_n:.2f}"
        assert mae_d < rec + 2.0, \
            f"std {std}: MAE {mae_d:.2f} drifted from recorded {rec}"


@pytest.mark.slow  # full-frame x multi-sigma gate: ~4-5 min each
@pytest.mark.skipif(not os.path.isdir(KITTI_DIR),
                    reason="KITTI test frames not mounted")
def test_shipped_tpu_flagship_kitti_gate():
    """The TPU-tuned flagship artifact (unet_laplacian_v6_tpu_scratch —
    the per-level width/kernel architecture trained from scratch on the
    35 mounted frames, docs/TRAINING_DEMO.md round 3b) gated on real
    KITTI frames: must beat noisy on MAE at every README-sweep std and
    stay within striking distance of its recorded sweep (margin absorbs
    frame-set/crop differences vs the 4-held-out-frame protocol)."""
    import blind_image_denoising_tpu as bid
    if "unet_laplacian_v6_tpu_scratch" not in bid.models:
        pytest.skip("shipped artifact not present")
    den = bid.load_model("unet_laplacian_v6_tpu_scratch")

    # (sigma, recorded MAE_denoised) from the training run's sweep
    recorded = {10: 5.99, 20: 6.63, 40: 7.87, 80: 10.27}
    clean_all = _kitti_crops(256)
    rng = np.random.default_rng(0)
    for std, rec in recorded.items():
        clean_j = jnp.asarray(clean_all)
        n = np.clip(rng.normal(0, std, clean_all.shape), -2 * std, 2 * std)
        noisy = np.clip(np.round(clean_all + n), 0, 255).astype(np.uint8)
        out = jnp.asarray(np.asarray(den(noisy)), jnp.float32)
        mae_n = float(jnp.abs(jnp.asarray(noisy, jnp.float32)
                              - clean_j).mean())
        mae_d = float(jnp.abs(out - clean_j).mean())
        assert mae_d < mae_n, f"std {std}: {mae_d:.2f} vs noisy {mae_n:.2f}"
        assert mae_d < rec + 2.0, \
            f"std {std}: MAE {mae_d:.2f} drifted from recorded {rec}"


@pytest.mark.slow  # full-frame x multi-sigma gate: ~4-5 min each
@pytest.mark.skipif(not os.path.isdir(KITTI_DIR),
                    reason="KITTI test frames not mounted")
def test_shipped_highnoise_artifact_kitti_gate():
    """The package's OWN headline artifact (unet_laplacian_v56_highnoise)
    gated on real KITTI frames at the high-noise stds it advertises:
    denoised must beat noisy on MAE and PSNR at std ∈ {40, 60, 80}, and
    by a wide margin (>= 2x MAE reduction — the model's measured margins
    are ~3-4x, docs/QUALITY_BENCHMARK.md)."""
    import blind_image_denoising_tpu as bid
    from blind_image_denoising_tpu.ops.losses import psnr
    if "unet_laplacian_v56_highnoise" not in bid.models:
        pytest.skip("shipped artifact not present")
    den = bid.load_model("unet_laplacian_v56_highnoise")

    clean_all = _kitti_crops(256)
    rng = np.random.default_rng(0)
    for std in (40, 60, 80):
        clean_j = jnp.asarray(clean_all)
        noisy = np.clip(
            np.round(clean_all + rng.normal(0, std, clean_all.shape)),
            0, 255).astype(np.uint8)
        noisy_f = jnp.asarray(noisy, jnp.float32)
        out = jnp.asarray(np.asarray(den(noisy)), jnp.float32)
        mae_n = float(jnp.abs(noisy_f - clean_j).mean())
        mae_d = float(jnp.abs(out - clean_j).mean())
        assert mae_d < 0.5 * mae_n, \
            f"std {std}: MAE {mae_d:.2f} vs noisy {mae_n:.2f}"
        assert float(psnr(clean_j, out)) > float(psnr(clean_j, noisy_f)), \
            f"PSNR not improved at std {std}"


@pytest.mark.slow  # degradation-chain suite on real frames: minutes
@pytest.mark.skipif(not os.path.isdir(KITTI_DIR),
                    reason="KITTI test frames not mounted")
def test_shipped_restoration_artifact_kitti_gate():
    """The blind-RESTORATION artifact (the degradation suite the
    reference parses but never applies — reference dataset.py:83-105 —
    trained end-to-end, scripts/train_restoration.py): restored must be
    strictly better than corrupt on MAE, PSNR and SSIM for EVERY chain
    in the report-card suite (VERDICT r4 #3's done-criterion)."""
    import blind_image_denoising_tpu as bid
    if "unet_laplacian_v6_tpu_restoration" not in bid.models:
        pytest.skip("restoration artifact not packaged yet")
    from blind_image_denoising_tpu.evaluate import degradation_sweep

    den = bid.load_model("unet_laplacian_v6_tpu_restoration")
    clean = _kitti_crops(256)[:8]
    specs = ("jpeg:30", "jpeg:50", "blur:1.0", "blur:1.5+noise:25",
             "noise:30+jpeg:50", "posterize:8+noise:20",
             "holes:0.1+noise:10")
    rows = degradation_sweep(den, clean, specs, seed=0)
    for r in rows:
        assert r["mae_restored"] < r["mae_corrupt"], r
        assert r["psnr_restored"] > r["psnr_corrupt"], r
        assert r["ssim_restored"] > r["ssim_corrupt"], r
