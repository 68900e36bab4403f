"""Regularizer invariants (extends reference tests/bfcnn/test_regularizer.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from blind_image_denoising_tpu.ops import regularizers as R


def _orthonormal_kernel(kh=1, kw=1, cin=8, cout=8):
    # HWIO kernel whose (out, in*kh*kw) matrix has orthonormal rows
    q, _ = np.linalg.qr(np.random.default_rng(0).normal(size=(kh * kw * cin, cout)))
    return jnp.asarray(q.reshape(kh, kw, cin, cout).astype(np.float32))


def test_reshape_to_2d_shape():
    w = jnp.zeros((3, 3, 16, 32))
    m = R.reshape_to_2d(w)
    assert m.shape == (32, 3 * 3 * 16)
    w2 = jnp.zeros((16, 32))
    assert R.reshape_to_2d(w2).shape == (32, 16)


def test_soft_orthonormal_zero_for_orthonormal_kernel():
    w = _orthonormal_kernel()
    v = float(R.soft_orthonormal(w, lambda_coefficient=1.0,
                                 l1_coefficient=0.0, l2_coefficient=0.0))
    assert v == pytest.approx(0.0, abs=1e-3)


def test_soft_orthogonal_zero_for_orthogonal_scaled_kernel():
    # orthogonal (but not orthonormal) rows -> off-diagonal of W Wt is 0
    w = _orthonormal_kernel() * 3.0
    v = float(R.soft_orthogonal(w, lambda_coefficient=1.0,
                                l1_coefficient=0.0, l2_coefficient=0.0))
    assert v == pytest.approx(0.0, abs=1e-2)
    # but orthonormal penalty is nonzero (norms are 9, not 1)
    v2 = float(R.soft_orthonormal(w, lambda_coefficient=1.0,
                                  l1_coefficient=0.0, l2_coefficient=0.0))
    assert v2 > 1.0


def test_soft_penalties_positive_for_random():
    w = jnp.asarray(np.random.default_rng(1).normal(size=(3, 3, 4, 8)).astype(np.float32))
    assert float(R.soft_orthogonal(w)) > 0.0
    assert float(R.soft_orthonormal(w)) > 0.0


def test_l1_l2():
    w = jnp.asarray([[1.0, -2.0]])
    assert float(R.l1(w, 1.0)) == pytest.approx(3.0)
    assert float(R.l2(w, 1.0)) == pytest.approx(5.0)
    assert float(R.l1l2(w, 1.0, 1.0)) == pytest.approx(8.0)


def test_erf_prefers_peripheral_mass():
    center = np.zeros((5, 5, 1, 1), dtype=np.float32)
    center[2, 2] = 1.0
    edge = np.zeros((5, 5, 1, 1), dtype=np.float32)
    edge[0, 0] = 1.0
    v_center = float(R.erf(jnp.asarray(center), l1_coefficient=1.0))
    v_edge = float(R.erf(jnp.asarray(edge), l1_coefficient=1.0))
    assert v_center > v_edge


def test_builder_string_dict_list():
    w = jnp.asarray(np.random.default_rng(2).normal(size=(3, 3, 2, 4)).astype(np.float32))
    fn_l1 = R.builder("l1")
    fn_l2 = R.builder({"type": "l2", "config": {"l2": 0.5}})
    fn_mix = R.builder(["l1", {"type": "l2", "config": {"l2": 0.5}}])
    assert float(fn_mix(w)) == pytest.approx(float(fn_l1(w)) + float(fn_l2(w)), rel=1e-6)
    fn_so = R.builder({"type": "soft_orthogonal", "config": {}})
    fn_son = R.builder("soft_orthonormal")
    fn_erf = R.builder({"type": "erf", "config": {"l1_coefficient": 0.025}})
    for fn in (fn_so, fn_son, fn_erf):
        assert float(fn(w)) >= 0.0
    with pytest.raises(Exception):
        R.builder("unknown_reg")
