"""Pruning tests — strategy helpers + pytree application, mirroring the
reference's tests/bfcnn/test_pruning.py patterns."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blind_image_denoising_tpu.pruning import (
    PruneStrategy, prune_strategy_helper, prune_function_builder,
    prune_params, get_conv_weights)


W = np.asarray([[-0.5, -0.05], [0.05, 0.5]], np.float32)


def test_strategy_from_string():
    assert PruneStrategy.from_string("minimum_threshold") \
        == PruneStrategy.MINIMUM_THRESHOLD
    assert PruneStrategy.NONE.to_string() == "NONE"
    with pytest.raises(ValueError):
        PruneStrategy.from_string("")


def test_none_is_identity():
    fn = prune_strategy_helper(PruneStrategy.NONE)
    np.testing.assert_array_equal(fn(W), W)


def test_minimum_threshold():
    before = W.copy()
    fn = prune_strategy_helper(PruneStrategy.MINIMUM_THRESHOLD,
                               minimum_threshold=0.1)
    out = fn(W)
    np.testing.assert_array_equal(
        out, np.asarray([[-0.5, 0.0], [0.0, 0.5]], np.float32))
    np.testing.assert_array_equal(W, before)  # input untouched (copy)


def test_bifurcate_rerandomizes_small():
    fn = prune_strategy_helper(PruneStrategy.MINIMUM_THRESHOLD_BIFURCATE,
                               minimum_threshold=0.1, seed=0)
    out = fn(W)
    # large weights untouched; small ones either 0 or |w| >= threshold
    assert out[0, 0] == -0.5 and out[1, 1] == 0.5
    for v in (out[0, 1], out[1, 0]):
        assert v == 0.0 or abs(v) >= 0.1


def test_shrinkage():
    fn = prune_strategy_helper(PruneStrategy.MINIMUM_THRESHOLD_SHRINKAGE,
                               minimum_threshold=0.01, shrinkage=0.5,
                               shrinkage_threshold=0.1)
    out = fn(W)
    assert out[0, 1] == pytest.approx(-0.025)
    assert out[0, 0] == -0.5


def test_drop_bottom_percentile():
    fn = prune_strategy_helper(PruneStrategy.DROP_BOTTOM, percentage=0.5)
    out = fn(W)
    assert (out == 0).sum() == 2
    assert out[0, 0] == -0.5 and out[1, 1] == 0.5


def test_pca_projection_full_variance_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(3, 3, 4, 8)).astype(np.float32)
    fn = prune_strategy_helper(PruneStrategy.PCA_PROJECTION,
                               variance=0.9999999, scale=False)
    out = fn(w)
    assert out.shape == w.shape
    np.testing.assert_allclose(out, w, atol=1e-4)


def test_prune_params_pytree():
    params = {
        "block": {"kernel": jnp.asarray(
            np.random.default_rng(0).normal(size=(3, 3, 2, 4))
            .astype(np.float32) * 0.01)},
        "bn": {"scale": jnp.ones((4,))},
    }
    fn = prune_function_builder(
        {"strategy": "minimum_threshold",
         "config": {"minimum_threshold": 1.0}})
    pruned = prune_params(params, fn)
    assert float(jnp.abs(pruned["block"]["kernel"]).sum()) == 0.0
    np.testing.assert_array_equal(np.asarray(pruned["bn"]["scale"]), 1.0)
    assert len(get_conv_weights(params)) == 1


def test_builder_none_default():
    fn = prune_function_builder(None)
    np.testing.assert_array_equal(fn(W), W)
