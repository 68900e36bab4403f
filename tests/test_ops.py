"""Core ops: normalize, padding, pooling, gaussian, noise, multiscale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blind_image_denoising_tpu import ops
from blind_image_denoising_tpu.config import input_shape_fixer


def test_normalize_round_trip():
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (2, 8, 8, 3)).astype(np.float32))
    n = ops.normalize(x)
    assert float(jnp.min(n)) >= -0.5 and float(jnp.max(n)) <= 0.5
    d = ops.denormalize(n)
    np.testing.assert_allclose(np.asarray(d), np.asarray(x), atol=1e-3)


def test_normalize_clips():
    x = jnp.asarray([[-50.0, 300.0]])
    n = ops.normalize(x)
    np.testing.assert_allclose(np.asarray(n), [[-0.5, 0.5]], atol=1e-6)


def test_pad_to_power_of_2():
    x = jnp.zeros((1, 100, 37, 3))
    padded, ph, pw = ops.pad_to_power_of_2(x)
    assert padded.shape == (1, 128, 64, 3)
    assert (ph, pw) == (28, 27)
    restored = ops.remove_padding(padded, ph, pw)
    assert restored.shape == x.shape


def test_pad_noop_on_power_of_2():
    x = jnp.zeros((1, 64, 128, 1))
    padded, ph, pw = ops.pad_to_power_of_2(x)
    assert padded.shape == x.shape and ph == 0 and pw == 0


def test_avg_pool_same_matches_tf_border_semantics():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 17, 23, 3)).astype(np.float32)
    ours = np.asarray(ops.avg_pool_same(jnp.asarray(x), (5, 5), (2, 2)))
    theirs = tf.keras.layers.AveragePooling2D(
        pool_size=(5, 5), strides=(2, 2), padding="same")(tf.constant(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_upsample_bilinear_matches_tf():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 9, 13, 2)).astype(np.float32)
    ours = np.asarray(ops.upsample_2x_bilinear(jnp.asarray(x)))
    theirs = tf.keras.layers.UpSampling2D(
        size=(2, 2), interpolation="bilinear")(tf.constant(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_upsample_nearest():
    x = jnp.asarray([[[[1.0], [2.0]], [[3.0], [4.0]]]])
    up = ops.upsample_2x_nearest(x)
    assert up.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(up[0, :2, :2, 0]), [[1, 1], [1, 1]])


def test_gaussian_kernel_normalized():
    k = ops.gaussian_kernel_2d((5, 5), (2.0, 2.0))
    assert k.shape == (5, 5)
    assert k.sum() == pytest.approx(1.0, abs=1e-6)
    assert k[2, 2] == k.max()


def test_gaussian_blur_preserves_mean():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32))
    blurred = ops.gaussian_blur(x, (5, 5))
    assert blurred.shape == x.shape
    # variance shrinks under smoothing
    assert float(jnp.var(blurred)) < float(jnp.var(x))


def test_truncated_normal_bounds():
    key = jax.random.PRNGKey(0)
    samples = ops.truncated_normal(key, (10000,), mean=0.0, std=10.0)
    assert float(jnp.max(jnp.abs(samples))) <= 20.0 + 1e-3
    assert abs(float(jnp.mean(samples))) < 1.0


def test_corrupt_batch_changes_input_and_rounds():
    key = jax.random.PRNGKey(1)
    x = jnp.full((8, 16, 16, 3), 128.0)
    noisy = ops.corrupt_batch(key, x, additive_noise=[5, 40],
                              multiplicative_noise=[0.05, 0.1])
    assert noisy.shape == x.shape
    # rounded values
    np.testing.assert_allclose(np.asarray(noisy), np.round(np.asarray(noisy)))
    # at least some samples corrupted
    assert float(jnp.mean(jnp.abs(noisy - x))) > 0.1


def test_corrupt_batch_per_sample_independence():
    key = jax.random.PRNGKey(2)
    x = jnp.full((16, 8, 8, 1), 100.0)
    noisy = ops.corrupt_batch(key, x, additive_noise=[20, 20],
                              multiplicative_noise=None)
    per_sample_mae = np.asarray(jnp.mean(jnp.abs(noisy - x), axis=(1, 2, 3)))
    # with p=0.5 per sample, 16 samples: overwhelmingly some on and some off
    assert (per_sample_mae < 0.5).any() and (per_sample_mae > 5.0).any()


def test_draw_stds_log_uniform_distribution():
    """log_uniform spends equal mass per octave: the median lands at
    sqrt(lo*hi), vs (lo+hi)/2 for uniform (ops/noise.py draw_stds)."""
    from blind_image_denoising_tpu.ops.noise import draw_stds
    key = jax.random.PRNGKey(4)
    lo, hi = 1.0, 80.0
    u = np.asarray(draw_stds(key, 20000, lo, hi, "uniform")).ravel()
    g = np.asarray(draw_stds(key, 20000, lo, hi, "log_uniform")).ravel()
    assert u.min() >= lo and u.max() <= hi
    assert g.min() >= lo and g.max() <= hi
    assert abs(np.median(u) - (lo + hi) / 2) < 2.0
    assert abs(np.median(g) - np.sqrt(lo * hi)) < 1.0
    # the point of the option: ~50% of log-uniform draws are low-noise
    assert (g <= 10).mean() > 0.45
    assert (u <= 10).mean() < 0.15
    with pytest.raises(ValueError):
        draw_stds(key, 4, lo, hi, "nope")


def test_corrupt_batch_log_uniform_sampling():
    key = jax.random.PRNGKey(5)
    x = jnp.full((8, 16, 16, 3), 128.0)
    noisy = ops.corrupt_batch(key, x, additive_noise=[1, 80],
                              multiplicative_noise=None,
                              noise_sampling="log_uniform")
    assert noisy.shape == x.shape
    assert float(jnp.mean(jnp.abs(noisy - x))) > 0.1

    # regression: must trace under jit (the train step's real context) —
    # jnp.log(lo) inside the trace returned a tracer that float() choked
    # on; draw_stds now uses math.log on the static bounds
    jitted = jax.jit(lambda k, v: ops.corrupt_batch(
        k, v, additive_noise=[1, 80], multiplicative_noise=[0.1, 0.2],
        noise_sampling="log_uniform"))
    noisy_j = jitted(key, x)
    assert noisy_j.shape == x.shape


def test_random_flips():
    key = jax.random.PRNGKey(3)
    x = jnp.arange(2 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 4, 1)
    flipped = ops.random_flips(key, x)
    assert flipped.shape == x.shape
    # each sample is either the original or a flip of it: same multiset of values
    np.testing.assert_allclose(
        np.sort(np.asarray(flipped).ravel()), np.sort(np.asarray(x).ravel()))


def test_multiscale_targets():
    x = jnp.asarray(np.random.default_rng(4).uniform(
        0, 255, (2, 64, 64, 3)).astype(np.float32))
    scales = ops.multiscale_targets(x, no_scales=3, clip_values=True, round_values=True)
    assert len(scales) == 4
    assert scales[0].shape == (2, 64, 64, 3)
    assert scales[3].shape == (2, 8, 8, 3)
    for s in scales[1:]:
        arr = np.asarray(s)
        np.testing.assert_allclose(arr, np.round(arr))
        assert arr.min() >= 0.0 and arr.max() <= 255.0


def test_input_shape_fixer():
    assert input_shape_fixer(["?", "?", 3]) == [None, None, 3]
    assert input_shape_fixer([256, 256, 3]) == [256, 256, 3]
    assert input_shape_fixer(["-1", "", 1]) == [None, None, 1]


def test_gaussian_kernel_non_square():
    """Regression: meshgrid default 'xy' indexing transposed the grid, so
    non-square sizes crashed and unequal sigmas landed on the wrong axes."""
    k = ops.gaussian_kernel_2d((3, 5), (1.0, 2.0))
    assert k.shape == (3, 5)
    assert k.sum() == pytest.approx(1.0, abs=1e-6)
    # blur with a non-square kernel works end to end
    x = jnp.ones((1, 16, 16, 2), jnp.float32)
    y = ops.gaussian_blur(x, kernel_size=(3, 5))
    assert y.shape == x.shape


def test_gaussian_sigma_axis_orientation():
    """nsig[0] belongs to axis 0 (H): a tight sigma on H and wide on W must
    decay faster along rows than along columns."""
    k = ops.gaussian_kernel_2d((5, 5), (3.0, 0.5))
    # wide nsig -> grid reaches further in that axis -> edge weight smaller
    center = k[2, 2]
    assert k[0, 2] < k[2, 0]  # axis-0 edge decays more (nsig[0]=3 spreads grid)
    assert center == k.max()
