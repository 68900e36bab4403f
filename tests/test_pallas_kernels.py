"""Pallas TPU kernel tests.

The corruption kernel's PRNG (pltpu.prng_random_bits) only produces real
entropy on actual TPU hardware — the CPU interpreter stubs it to zeros —
so statistical assertions are TPU-gated; shape/contract checks run under
interpret mode everywhere."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blind_image_denoising_tpu.ops.pallas_noise import corrupt_batch_pallas

on_tpu = any(d.platform == "tpu" for d in jax.devices())


def test_no_noise_config_roundtrip():
    x = jnp.asarray(np.full((2, 16, 16, 3), 100.5, np.float32))
    y = corrupt_batch_pallas(0, x, additive_noise=None,
                             multiplicative_noise=None)
    np.testing.assert_allclose(np.asarray(y), 100.0)  # round only


def test_interpret_mode_contract():
    from jax.experimental.pallas import tpu as pltpu
    x = jnp.asarray(np.full((2, 32, 16, 3), 128.0, np.float32))
    with pltpu.force_tpu_interpret_mode():
        y = corrupt_batch_pallas(1, x, additive_noise=[5, 10])
    assert np.asarray(y).shape == x.shape


@pytest.mark.skipif(not on_tpu, reason="needs real TPU PRNG")
def test_tpu_statistics_and_determinism():
    x = jnp.asarray(np.full((8, 64, 64, 3), 128.0, np.float32))
    f = jax.jit(lambda s, v: corrupt_batch_pallas(
        s, v, additive_noise=[5, 20], multiplicative_noise=[0.05, 0.1]))
    y = np.asarray(f(42, x))
    assert np.allclose(y, np.round(y))
    # preserved mean, per-sample noise decisions
    assert abs(y.mean() - 128.0) < 1.0
    assert np.array_equal(y, np.asarray(f(42, x)))        # deterministic
    assert not np.array_equal(y, np.asarray(f(43, x)))    # seed-sensitive
    stds = y.reshape(8, -1).std(axis=1)
    assert (stds > 0).any()


def test_laplacian_band_split_parity():
    """Fused band-split kernel matches the XLA composition (interpret mode
    works on CPU — no PRNG involved)."""
    from blind_image_denoising_tpu.ops.pallas_pyramid import (
        laplacian_band_split_pallas, laplacian_band_split_reference)
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 255, (2, 32, 16, 3)).astype(np.float32))
    for k in (2, 3, 5):
        band_p, down_p = laplacian_band_split_pallas(x, k, interpret=True)
        band_r, down_r = laplacian_band_split_reference(x, k)
        np.testing.assert_allclose(np.asarray(band_p), np.asarray(band_r),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(down_p), np.asarray(down_r),
                                   atol=1e-4)
        assert down_p.shape == (2, 16, 8, 3)


def test_laplacian_band_smooth_parity():
    """Full-res band+smooth kernel (the flagship encoder's fused split)
    matches the XLA composition in interpret mode."""
    from blind_image_denoising_tpu.ops.pallas_pyramid import (
        laplacian_band_smooth_pallas, laplacian_band_smooth_reference)
    x = jnp.asarray(np.random.default_rng(1)
                    .uniform(0, 255, (2, 32, 16, 3)).astype(np.float32))
    for k in (2, 3, 5):
        band_p, smooth_p = laplacian_band_smooth_pallas(x, k, interpret=True)
        band_r, smooth_r = laplacian_band_smooth_reference(x, k)
        np.testing.assert_allclose(np.asarray(band_p), np.asarray(band_r),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(smooth_p), np.asarray(smooth_r),
                                   atol=1e-4)
        assert smooth_p.shape == x.shape


def test_band_smooth_vjp_matches_xla_grad():
    """The custom VJP of the fused band-split (dx = g_band + Aᵀ(g_smooth −
    g_band)) must equal jax.grad through the plain-XLA composition — the
    train step differentiates through the Pallas path on TPU."""
    from blind_image_denoising_tpu.ops.pallas_pyramid import (
        _band_smooth_bwd, laplacian_band_smooth_reference)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 8, 3)).astype(np.float32))
    for k in (2, 3, 5):
        g_band = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
        g_smooth = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
        _, vjp_fn = jax.vjp(
            lambda v: laplacian_band_smooth_reference(v, k), x)
        (dx_ref,) = vjp_fn((g_band, g_smooth))
        (dx_custom,) = _band_smooth_bwd(k, None, (g_band, g_smooth))
        np.testing.assert_allclose(np.asarray(dx_custom), np.asarray(dx_ref),
                                   rtol=1e-5, atol=1e-5)


def test_band_split_bf16_inputs():
    """Regression: the band-split kernel's precomputed inv-den operand must
    be cast to the input dtype — bf16 inputs (the flagship's documented
    compute dtype) used to crash at trace time with an f32-into-bf16-ref
    store."""
    from blind_image_denoising_tpu.ops.pallas_pyramid import (
        laplacian_band_split_pallas, laplacian_band_split_reference,
        laplacian_band_smooth_pallas)
    x = jnp.asarray(np.random.default_rng(2)
                    .uniform(0, 255, (1, 32, 16, 3))).astype(jnp.bfloat16)
    band, down = laplacian_band_split_pallas(x, 3, interpret=True)
    assert band.dtype == jnp.bfloat16 and down.dtype == jnp.bfloat16
    band_r, down_r = laplacian_band_split_reference(x, 3)
    np.testing.assert_allclose(
        np.asarray(band, np.float32), np.asarray(band_r, np.float32), atol=2.0)
    np.testing.assert_allclose(
        np.asarray(down, np.float32), np.asarray(down_r, np.float32), atol=2.0)
    # the sibling full-res kernel stays bf16-safe too
    b2, s2 = laplacian_band_smooth_pallas(x, 3, interpret=True)
    assert b2.dtype == jnp.bfloat16 and s2.dtype == jnp.bfloat16
