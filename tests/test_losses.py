"""Loss math unit tests — coverage the reference lacks entirely
(reference tests/bfcnn/test_loss.py is empty)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blind_image_denoising_tpu.ops import (
    mae, mae_diff, rmse, gar_loss, improvement, psnr, ssim, ssim_loss,
)


def test_mae_zero_error():
    x = jnp.ones((2, 8, 8, 3)) * 100.0
    assert float(mae(x, x)) == 0.0


def test_mae_plain():
    gt = jnp.zeros((1, 4, 4, 1))
    pred = jnp.full((1, 4, 4, 1), 3.0)
    assert float(mae(gt, pred, hinge=0.0, cutoff=255.0)) == pytest.approx(3.0)


def test_mae_hinge_zeroes_small_errors():
    # errors below the hinge contribute exactly 0 (not error - hinge)
    gt = jnp.zeros((1, 2, 2, 1))
    pred = jnp.asarray([[[[0.5], [0.5]], [[2.0], [2.0]]]])
    # hinge 1.0: two errors of 0.5 -> 0, two of 2.0 -> 2.0; mean = 1.0
    assert float(mae(gt, pred, hinge=1.0, cutoff=255.0)) == pytest.approx(1.0)


def test_mae_cutoff_clamps_large_errors():
    gt = jnp.zeros((1, 1, 1, 1))
    pred = jnp.full((1, 1, 1, 1), 500.0)
    assert float(mae(gt, pred, hinge=0.0, cutoff=255.0)) == pytest.approx(255.0)


def test_rmse_positive_error_only_quirk():
    # reference rmse hinges the SIGNED error: negative residuals are dropped
    gt = jnp.zeros((1, 1, 2, 1))
    pred = jnp.asarray([[[[-4.0], [4.0]]]])  # errors: +4, -4
    v = float(rmse(gt, pred, hinge=0.0, cutoff=255.0 * 255.0))
    expected = np.sqrt((4.0 ** 2 + 0.0) / 2.0 + 1e-3)
    assert v == pytest.approx(expected, rel=1e-5)


def test_gar_loss_zero_at_zero():
    assert float(gar_loss(jnp.zeros(()), alpha=1.0, c=1.0)) == pytest.approx(0.0)
    # monotonic in |x|
    assert float(gar_loss(jnp.asarray(2.0))) > float(gar_loss(jnp.asarray(1.0)))


def test_improvement_sign():
    rng = np.random.default_rng(0)
    orig = jnp.asarray(rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32))
    noisy = orig + 20.0
    denoised = orig + 5.0
    assert float(improvement(orig, noisy, denoised)) > 0.0
    assert float(improvement(orig, denoised, noisy)) < 0.0


def test_psnr_identical_is_large():
    x = jnp.ones((1, 8, 8, 3)) * 128.0
    assert float(psnr(x, x)) > 100.0


def test_ssim_identity_is_one():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)).astype(np.float32))
    s = ssim(x, x, max_val=255.0, filter_size=7)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-4)


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    n1 = x + jnp.asarray(rng.normal(0, 5, x.shape).astype(np.float32))
    n2 = x + jnp.asarray(rng.normal(0, 50, x.shape).astype(np.float32))
    s1 = float(jnp.mean(ssim(x, n1, filter_size=7)))
    s2 = float(jnp.mean(ssim(x, n2, filter_size=7)))
    assert 1.0 > s1 > s2


def test_ssim_matches_tensorflow():
    """Cross-check against tf.image.ssim (the exact function the reference
    loss uses, reference loss.py:217-227)."""
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 255, (2, 48, 48, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 20, a.shape), 0, 255).astype(np.float32)
    ours = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b),
                           max_val=255.0, filter_size=7))
    theirs = tf.image.ssim(tf.constant(a), tf.constant(b),
                           max_val=255.0, filter_size=7).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-3)


def test_ssim_loss_range():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32))
    v = float(ssim_loss(x, y))
    assert 0.0 <= v <= 2.0
    assert float(ssim_loss(x, x)) == pytest.approx(0.0, abs=1e-4)
