"""Tests for ops/degradations.py — the reference's declared-but-dead
dataset options (random_rotate / random_blur / use_jpeg_noise /
quantization / inpaint_drop_rate, reference dataset.py:83-105) implemented
as real on-device corruptions.

The JPEG fidelity bar is external: our DCT-domain distortion must match
what the real libjpeg encoder (via PIL, 4:4:4) does to the same image.
"""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blind_image_denoising_tpu.ops.degradations import (
    degrade_batch,
    inpaint_dropout,
    jpeg_artifacts,
    quantize_batch,
    random_blur,
    random_jpeg,
    random_quantize,
    random_rotate_batch,
    rotate_batch,
    separable_blur_batch,
)

KITTI_FRAME = "/root/reference/images/test/kitti/files/kitti_0000000000.png"


@pytest.fixture(scope="module")
def kitti_crop() -> np.ndarray:
    from PIL import Image
    img = np.asarray(Image.open(KITTI_FRAME).convert("RGB"), np.float32)
    return np.ascontiguousarray(img[:256, :256])


# ---------------------------------------------------------------------------
# rotation
# ---------------------------------------------------------------------------


def test_rotate_zero_is_identity(kitti_crop):
    b = jnp.asarray(kitti_crop[None])
    out = rotate_batch(b, jnp.asarray([0.0]))
    assert float(jnp.abs(out - b).max()) == 0.0


def test_rotate_90_matches_rot90(kitti_crop):
    """On a square image, a 90-degree rotation maps grid onto grid, so the
    bilinear sampler must reproduce np.rot90 exactly (up to float eps)."""
    b = jnp.asarray(kitti_crop[None])
    out = np.asarray(rotate_batch(b, jnp.asarray([np.pi / 2])))[0]
    ref = np.rot90(kitti_crop, k=-1, axes=(0, 1))
    assert np.abs(out - ref).max() < 1e-2


def test_rotate_round_trip_interior(kitti_crop):
    """rotate(a) then rotate(-a) must reconstruct the interior (borders
    are reflect-filled) to within bilinear smoothing error."""
    b = jnp.asarray(kitti_crop[None])
    a = 0.2
    once = rotate_batch(b, jnp.asarray([a]))
    back = np.asarray(rotate_batch(once, jnp.asarray([-a])))[0]
    inner = (slice(64, -64), slice(64, -64))
    mae = np.abs(back[inner] - kitti_crop[inner]).mean()
    assert mae < 4.0  # two bilinear resamplings of a natural image


def test_random_rotate_per_sample_and_jit(kitti_crop):
    batch = jnp.asarray(np.stack([kitti_crop] * 4))
    fn = jax.jit(lambda k, x: random_rotate_batch(k, x, 0.3))
    out = np.asarray(fn(jax.random.PRNGKey(0), batch))
    assert out.shape == batch.shape
    assert np.isfinite(out).all()
    # independent per-sample angles: samples must differ from each other
    assert np.abs(out[0] - out[1]).max() > 1.0


# ---------------------------------------------------------------------------
# blur
# ---------------------------------------------------------------------------


def test_blur_constant_invariant():
    const = jnp.full((2, 32, 32, 3), 100.0)
    out = separable_blur_batch(const, jnp.asarray([0.5, 2.0]))
    assert float(jnp.abs(out - 100.0).max()) < 1e-3


def test_blur_matches_reference_gaussian_kernel(kitti_crop):
    """Separable per-sample blur at sigma s with k taps equals the
    reference-derived 2D Gaussian kernel (ops/gaussian.py) with
    nsig = (k-1)/(2 s), away from the (edge-vs-zero padded) borders."""
    from blind_image_denoising_tpu.ops.gaussian import gaussian_blur
    b = jnp.asarray(kitti_crop[None])
    sig, taps = 1.5, 7
    nsig = (taps - 1) / (2.0 * sig)
    mine = np.asarray(separable_blur_batch(b, jnp.asarray([sig]), taps=taps))
    ref = np.asarray(gaussian_blur(b, kernel_size=(taps, taps),
                                   nsig=(nsig, nsig)))
    inner = (slice(None), slice(8, -8), slice(8, -8))
    assert np.abs(mine[inner] - ref[inner]).max() < 1e-3


def test_random_blur_flag_probability_and_strength(kitti_crop):
    batch = jnp.asarray(np.stack([kitti_crop] * 64))
    out = np.asarray(random_blur(jax.random.PRNGKey(3), batch))
    changed = np.array([np.abs(out[i] - kitti_crop).max() > 1e-3
                        for i in range(64)])
    # ~50% of samples blurred
    assert 0.25 < changed.mean() < 0.75
    # blurred samples lose high-frequency energy
    hf = lambda x: np.abs(np.diff(x, axis=0)).mean()
    assert all(hf(out[i]) < hf(kitti_crop) for i in np.nonzero(changed)[0])


# ---------------------------------------------------------------------------
# JPEG
# ---------------------------------------------------------------------------


def test_jpeg_matches_libjpeg_distortion(kitti_crop):
    """External fidelity bar: at each quality, our DCT-domain codec must
    (a) produce the same distortion magnitude as the real libjpeg encoder
    at 4:4:4 (entropy coding is lossless) and (b) be pixelwise close to
    its decoded output."""
    from PIL import Image
    b = jnp.asarray(kitti_crop[None])
    for q in (25, 50, 75, 90):
        ours = np.asarray(jpeg_artifacts(b, jnp.asarray([float(q)])))[0]
        buf = io.BytesIO()
        Image.fromarray(kitti_crop.astype(np.uint8)).save(
            buf, format="JPEG", quality=q, subsampling=0)
        pil = np.asarray(Image.open(buf)).astype(np.float32)
        d_ours = np.abs(ours - kitti_crop).mean()
        d_pil = np.abs(pil - kitti_crop).mean()
        assert d_ours == pytest.approx(d_pil, abs=0.25), f"quality {q}"
        assert np.abs(ours - pil).mean() < 2.0, f"quality {q}"


def test_jpeg_quality_monotonic(kitti_crop):
    b = jnp.asarray(kitti_crop[None])
    errs = [np.abs(np.asarray(jpeg_artifacts(
        b, jnp.asarray([float(q)])))[0] - kitti_crop).mean()
        for q in (10, 50, 95)]
    assert errs[0] > errs[1] > errs[2]


def test_jpeg_grayscale_and_nonmultiple8(kitti_crop):
    gray = kitti_crop[:100, :60, :1]  # non-multiple-of-8 dims, C=1
    out = np.asarray(jpeg_artifacts(jnp.asarray(gray[None]),
                                    jnp.asarray([50.0])))[0]
    assert out.shape == gray.shape
    assert 0.0 < np.abs(out - gray).mean() < 10.0
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_random_jpeg_flag_probability(kitti_crop):
    batch = jnp.asarray(np.stack([kitti_crop] * 64))
    out = np.asarray(random_jpeg(jax.random.PRNGKey(5), batch))
    changed = np.array([np.abs(out[i] - kitti_crop).mean() > 0.5
                        for i in range(64)])
    assert 0.25 < changed.mean() < 0.75


# ---------------------------------------------------------------------------
# quantization / inpainting
# ---------------------------------------------------------------------------


def test_quantize_levels(kitti_crop):
    for q in (2, 4, 8):
        out = np.asarray(quantize_batch(jnp.asarray(kitti_crop[None]),
                                        float(q)))
        assert np.all(out % q == 0)
        assert np.abs(out - kitti_crop[None]).max() <= q / 2.0


def test_random_quantize_flag(kitti_crop):
    batch = jnp.asarray(np.stack([kitti_crop] * 64))
    out = np.asarray(random_quantize(jax.random.PRNGKey(11), batch, 8.0))
    changed = np.array([not np.all(out[i] % 8 == 0) for i in range(64)])
    # unchanged samples are the original (not multiples of 8 in general)
    assert 0.25 < changed.mean() < 0.75


def test_inpaint_rate_and_channel_coherence(kitti_crop):
    batch = jnp.asarray(np.maximum(np.stack([kitti_crop] * 4), 1.0))
    out = np.asarray(inpaint_dropout(jax.random.PRNGKey(7), batch, 0.2))
    holes = (out == 0.0)
    # holes are whole pixels: all channels drop together
    assert np.array_equal(holes.any(axis=-1), holes.all(axis=-1))
    assert holes.all(axis=-1).mean() == pytest.approx(0.2, abs=0.02)


# ---------------------------------------------------------------------------
# composition + train-step integration
# ---------------------------------------------------------------------------


def test_degrade_batch_chain_under_jit(kitti_crop):
    batch = jnp.asarray(np.stack([kitti_crop] * 8))
    fn = jax.jit(lambda k, x: degrade_batch(
        k, x, additive_noise=[1, 40], multiplicative_noise=[0.01, 0.2],
        use_random_blur=True, use_jpeg_noise=True, quantization=4,
        inpaint_drop_rate=0.05))
    out = np.asarray(fn(jax.random.PRNGKey(0), batch))
    assert out.shape == batch.shape
    assert np.isfinite(out).all()
    assert np.abs(out - np.asarray(batch)).mean() > 1.0  # actually degraded
    assert np.array_equal(out, np.round(out))  # round_values default


def test_degrade_batch_chain_prob_master_gate(kitti_crop):
    """chain_prob: samples failing the master gate get the PURE noise
    path with the SAME noise draw; chain_prob=1.0 is bit-identical to
    the pre-gate stream (fold_in key, never the 5-way split)."""
    batch = jnp.asarray(np.stack([kitti_crop] * 16))
    kwargs = dict(additive_noise=[1, 40], use_random_blur=True,
                  use_jpeg_noise=True, quantization=4,
                  inpaint_drop_rate=0.25, degradation_prob=1.0)
    key = jax.random.PRNGKey(7)
    full = np.asarray(degrade_batch(key, batch, **kwargs))
    default = np.asarray(degrade_batch(key, batch, chain_prob=1.0, **kwargs))
    assert np.array_equal(full, default)  # default path untouched

    gated = np.asarray(degrade_batch(key, batch, chain_prob=0.5, **kwargs))
    noise_only = np.asarray(degrade_batch(
        key, batch, additive_noise=[1, 40], degradation_prob=1.0))
    # every sample equals EITHER the full chain or the pure-noise path
    is_full = np.array([np.array_equal(gated[i], full[i])
                        for i in range(16)])
    is_noise = np.array([np.array_equal(gated[i], noise_only[i])
                         for i in range(16)])
    assert np.all(is_full | is_noise)
    # with holes ungated at 0.25 drop the two classes are distinguishable
    # and both populated at this batch size w.h.p.
    assert 0 < is_full.sum() < 16


def test_train_step_with_all_degradations():
    """End-to-end: the jitted train step accepts every degradation option
    (the keys the reference only parses) and produces finite losses."""
    from blind_image_denoising_tpu.models.hydra import model_builder
    from blind_image_denoising_tpu.training.train_state import (
        create_train_state)
    from blind_image_denoising_tpu.training.train_step import (
        build_train_step)
    from blind_image_denoising_tpu.training.losses import (
        loss_function_builder)
    from blind_image_denoising_tpu.training.optimizer import (
        optimizer_builder)
    from blind_image_denoising_tpu.constants import TOTAL_LOSS_STR

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
    step = jax.jit(build_train_step(
        hydra, tx, loss_fns, no_outputs=1,
        additive_noise=[1, 20], multiplicative_noise=[0.01, 0.1],
        random_rotate=0.3, use_random_blur=True, use_jpeg_noise=True,
        quantization=4, inpaint_drop_rate=0.05))
    batch = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (2, 16, 16, 3)).astype(np.float32))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1),
                              jnp.ones((1,), jnp.float32))
    assert np.isfinite(float(metrics[TOTAL_LOSS_STR]))
    assert int(new_state.step) == 1


def test_pallas_noise_conflicts_with_degradations():
    from blind_image_denoising_tpu.training.train_step import (
        build_train_step)
    with pytest.raises(ValueError, match="pallas_noise"):
        build_train_step(None, None, {"denoiser": None, "model": None},
                         no_outputs=1, use_pallas_noise=True,
                         use_jpeg_noise=True)


# ---------------------------------------------------------------------------
# the apply_degradations opt-in gate
# ---------------------------------------------------------------------------


NEUTRAL = {"random_rotate": 0.0, "use_random_blur": False,
           "use_jpeg_noise": False, "quantization": -1,
           "inpaint_drop_rate": 0.0, "degradation_prob": 0.5,
           "degradation_chain_prob": 1.0}


def test_degradations_inert_without_opt_in_for_every_shipped_config():
    """Every packaged config carries the reference's (dead there)
    degradation values — without the explicit dataset.apply_degradations
    opt-in they must resolve to neutral, or retraining any shipped recipe
    would silently train a different task (rotation, 50% inpainting)."""
    import blind_image_denoising_tpu as bid
    from blind_image_denoising_tpu.training.train_loop import (
        resolve_degradation_options)
    for name, cfg in bid.CONFIGS_DICT.items():
        ds = cfg["dataset"]
        assert "apply_degradations" not in ds, name
        assert resolve_degradation_options(ds) == NEUTRAL, name


def test_degradations_resolve_with_opt_in():
    from blind_image_denoising_tpu.training.train_loop import (
        resolve_degradation_options)
    ds = {"apply_degradations": True, "random_rotate": 0.5,
          "random_blur": True, "use_jpeg_noise": True,
          "quantization": 8, "inpaint_drop_rate": 0.05}
    assert resolve_degradation_options(ds) == {
        "random_rotate": 0.5, "use_random_blur": True,
        "use_jpeg_noise": True, "quantization": 8,
        "inpaint_drop_rate": 0.05, "degradation_prob": 0.5,
        "degradation_chain_prob": 1.0}
    # the per-sample gate is configurable
    assert resolve_degradation_options(
        dict(ds, degradation_prob=0.35))["degradation_prob"] == 0.35
    # ... and so is the chain-level master gate
    assert resolve_degradation_options(
        dict(ds, degradation_chain_prob=0.5))[
            "degradation_chain_prob"] == 0.5
    # opt-in with no keys set stays neutral
    assert resolve_degradation_options({"apply_degradations": True}) \
        == NEUTRAL


def _tiny_step(monkeypatch_split=None, **kwargs):
    from blind_image_denoising_tpu.models.hydra import model_builder
    from blind_image_denoising_tpu.training.train_state import (
        create_train_state)
    from blind_image_denoising_tpu.training.train_step import (
        build_train_step)
    from blind_image_denoising_tpu.training.losses import (
        loss_function_builder)
    from blind_image_denoising_tpu.training.optimizer import (
        optimizer_builder)
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
    step = build_train_step(hydra, tx, loss_fns, no_outputs=1,
                            additive_noise=[1, 20], **kwargs)
    return step, state


@pytest.mark.parametrize("rotate,expect_three_way", [(0.0, False),
                                                     (0.3, True)])
def test_noise_key_stream_unchanged_by_degradation_suite(
        monkeypatch, rotate, expect_three_way):
    """With rotation off, the micro-batch rng must keep the original
    2-way (flip, noise) split so pre-degradation-suite seeds reproduce
    their corruption streams bitwise; the 3-way split appears only when
    rotation is actually on."""
    step, state = _tiny_step(random_rotate=rotate)
    calls = []
    orig = jax.random.split

    def spy(key, num=2):
        calls.append(int(num))
        return orig(key, num)

    monkeypatch.setattr(jax.random, "split", spy)
    batch = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (2, 16, 16, 3)).astype(np.float32))
    step(state, batch, jax.random.PRNGKey(1),  # unjitted: spy sees trace
         jnp.ones((1,), jnp.float32))
    assert (3 in calls) == expect_three_way


def test_per_sample_degradation_gate():
    """degradation_prob gates EVERY extended op per sample — at p=0.5
    with holes enabled, ~half the samples must be hole-free (the
    round-4a restoration run showed ungated 100% holes poison the mild
    regime), and p=0 leaves the batch untouched by the extended ops."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from blind_image_denoising_tpu.ops.degradations import (
        degrade_batch, inpaint_dropout)

    clean = jnp.full((64, 16, 16, 3), 128.0)
    key = jax.random.PRNGKey(0)

    holed = np.asarray(inpaint_dropout(key, clean, 0.25, prob=0.5))
    per_sample_holes = (holed == 0.0).mean(axis=(1, 2, 3))
    untouched = float((per_sample_holes == 0.0).mean())
    assert 0.25 < untouched < 0.75, untouched
    # gated-in samples carry ~25% holes
    touched = per_sample_holes[per_sample_holes > 0]
    assert abs(float(touched.mean()) - 0.25) < 0.05

    # prob=1.0 (the evaluate harness's deterministic-chain contract):
    # every sample is holed
    all_holed = np.asarray(inpaint_dropout(key, clean, 0.25, prob=1.0))
    assert ((all_holed == 0.0).mean(axis=(1, 2, 3)) > 0.1).all()

    # p=0: the full chain reduces to noise-only
    out = np.asarray(degrade_batch(
        key, clean, additional := None, round_values=True,
        use_random_blur=True, use_jpeg_noise=True, quantization=8,
        inpaint_drop_rate=0.3, degradation_prob=0.0))
    assert (out == 128.0).all()
