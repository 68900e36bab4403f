"""Interpretability analysis tests (analysis.py / analyze.py).

The math under test is the CVPR-2020 bias-free claim the reference's
README rests on (reference README.md:24-44): adaptive filters are exact
Jacobian rows, the net-bias map vanishes for a positively homogeneous
(bias-free piecewise-linear) network, and filters are supported inside
the receptive field.
"""

import copy
import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import TINY_RESNET_MODEL, tiny_resnet_hydra

from blind_image_denoising_tpu import analysis
from blind_image_denoising_tpu.inference.denoiser import Denoiser


def _tiny_denoiser():
    hydra, variables = tiny_resnet_hydra()
    # small pad multiple: the tiny resnet has no downsampling
    return Denoiser(hydra, variables, pad_multiple=8)


def _rng_image(shape=(24, 24, 3), lo=60, hi=200, seed=0):
    return np.random.default_rng(seed).uniform(
        lo, hi, shape).astype(np.float32)


def test_adaptive_filter_rows_match_jvp():
    """vjp-extracted filter rows must agree with jvp directional
    derivatives: ⟨a_p, v⟩ == (J v)[p] for a random direction v —
    validates the Jacobian-row plumbing end to end (through the
    Denoiser's pad/unpad pipeline)."""
    den = _tiny_denoiser()
    fwd = analysis.forward_from_denoiser(den)
    x = _rng_image()
    pixels = [(5, 7), (12, 3), (20, 20)]
    res = analysis.adaptive_filters(fwd, x, pixels, channel=1)

    v = np.random.default_rng(1).normal(
        size=x.shape).astype(np.float32)
    _, jv = jax.jvp(fwd, (jnp.asarray(x),), (jnp.asarray(v),))
    jv = np.asarray(jv)
    for a, (r, c) in zip(res.filters, pixels):
        np.testing.assert_allclose(
            float((a * v).sum()), jv[r, c, 1], rtol=1e-3, atol=1e-4)


def test_adaptive_filter_channel_mean_and_reconstruction():
    """channel=None analyzes the channel-mean output, and the returned
    decomposition reconstructs it: y_p = c + ⟨a_p, x−c⟩ + b_p."""
    den = _tiny_denoiser()
    fwd = analysis.forward_from_denoiser(den)
    x = _rng_image(seed=3)
    pixels = [(10, 10)]
    res = analysis.adaptive_filters(fwd, x, pixels)
    y = np.asarray(fwd(jnp.asarray(x)))
    np.testing.assert_allclose(
        res.outputs[0], y[10, 10].mean(), rtol=1e-5, atol=1e-5)
    recon = (analysis.DEFAULT_CENTER
             + (res.filters[0] * (x - analysis.DEFAULT_CENTER)).sum()
             + res.bias[0])
    np.testing.assert_allclose(recon, res.outputs[0], rtol=1e-4, atol=1e-3)


def test_net_bias_vanishes_for_homogeneous_network():
    """Euler's identity: for a bias-free ReLU backbone (positively
    1-homogeneous), J(u)·u == f(u) exactly, so the net-bias map is 0."""
    from blind_image_denoising_tpu.models import ResnetBackbone
    cfg = dict(
        type="resnet", filters=4, no_layers=1, kernel_size=3,
        block_kernels=[3], block_filters=[4], activation="relu",
        batchnorm=False, kernel_regularizer="l1",
        kernel_initializer="glorot_normal")
    m = ResnetBackbone(config=cfg)
    u = jnp.asarray(np.random.default_rng(2).normal(
        size=(12, 12, 3)).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), u[None])

    def fwd(d):
        return m.apply(vs, d[None])[0][0]

    y, bias = analysis.net_bias_map(fwd, u, center=0.0)
    assert np.abs(y).max() > 0  # non-degenerate
    assert np.abs(bias).max() < 1e-4


def test_net_bias_map_full_hydra_consistent_with_filters():
    """The jvp-based whole-image bias map must agree at probe pixels
    with the vjp-based per-pixel bias (two independent computations of
    the same quantity)."""
    den = _tiny_denoiser()
    fwd = analysis.forward_from_denoiser(den)
    x = _rng_image(seed=5)
    pixels = [(6, 6), (15, 9)]
    res = analysis.adaptive_filters(fwd, x, pixels, channel=0)
    _, bias_map = analysis.net_bias_map(fwd, x)
    for b, (r, c) in zip(res.bias, pixels):
        np.testing.assert_allclose(b, bias_map[r, c, 0],
                                   rtol=1e-3, atol=1e-3)


def test_filter_support_inside_receptive_field():
    """The adaptive filter of a center pixel must be exactly zero
    outside the network's receptive field (tiny resnet: base k=3 +
    one block of k∈{3,3} convs ⇒ radius ≤ 4; assert zero beyond 8)."""
    den = _tiny_denoiser()
    fwd = analysis.forward_from_denoiser(den)
    x = _rng_image(shape=(32, 32, 3), seed=7)
    res = analysis.adaptive_filters(fwd, x, [(16, 16)], channel=0)
    a = res.filters[0]
    mask = np.ones(a.shape[:2], bool)
    mask[16 - 8:16 + 9, 16 - 8:16 + 9] = False
    assert np.abs(a[mask]).max() == 0.0
    assert np.abs(a[~mask]).max() > 0.0
    # and the mass metric sees it
    mass = analysis.filter_mass_within(res.filters, res.pixels, radius=8)
    np.testing.assert_allclose(mass, [1.0], atol=1e-6)


def test_scale_equivariance_helper_exact_on_linear_map():
    """On a strictly affine-around-center map the helper must report
    ~zero error at every alpha (validates the centering math)."""
    c = analysis.DEFAULT_CENTER

    def fwd(x):
        return (x - c) * 0.5 + c

    x = jnp.asarray(_rng_image(seed=9))
    records = analysis.scale_equivariance(fwd, x)
    assert [r["alpha"] for r in records] == [0.25, 0.5, 0.75]
    for r in records:
        assert r["rel_error"] < 1e-5


def test_analyze_battery_and_report_schema():
    """analysis.analyze returns a JSON-serializable report with the
    documented keys, on the real tiny hydra."""
    den = _tiny_denoiser()
    x = _rng_image(shape=(24, 24, 3), seed=11)
    report, res, denoised, bias_map = analysis.analyze(
        den, x, pixels=[(8, 8), (16, 16)], alphas=(0.5,))
    json.dumps(report)  # serializable
    assert set(report) == {"net_bias", "scale_equivariance", "filters"}
    assert denoised.shape == x.shape and bias_map.shape == x.shape
    assert len(report["filters"]) == 2
    assert report["net_bias"]["mean_abs"] >= 0.0
    # bias-free tiny resnet: the only bias sources are the tanh head
    # curvature and value clipping — the relative net bias must be small
    assert report["net_bias"]["rel_to_output"] < 0.2


def test_forward_from_denoiser_rejects_non_native():
    with pytest.raises(TypeError):
        analysis.forward_from_denoiser(lambda x: x)


def test_float_forward_matches_uint8_path():
    """Denoiser.float_forward must equal the serving path before its
    round/clip/cast epilogue (same pad/tile pipeline)."""
    den = _tiny_denoiser()
    xu = _rng_image(shape=(24, 24, 3), seed=13).astype(np.uint8)
    yu = np.asarray(den(xu))
    yf = np.asarray(den.float_forward(xu.astype(np.float32)))
    # quantize the float path the same way the serving epilogue does
    yq = np.clip(np.round(yf), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(yq, yu)
    assert yf.dtype == np.float32 and yf.shape == xu.shape


def test_analyze_cli_smoke(tmp_path, capsys):
    """End-to-end CLI on a hand-built artifact dir: JSON on stdout,
    figures written."""
    import flax.serialization
    from blind_image_denoising_tpu.analyze import main

    hydra, variables = tiny_resnet_hydra()
    art = tmp_path / "artifact"
    art.mkdir()
    (art / "pipeline.json").write_text(json.dumps({
        "model": copy.deepcopy(TINY_RESNET_MODEL),
        "dataset": {"input_shape": [16, 16, 3]},
    }))
    (art / "params.msgpack").write_bytes(
        flax.serialization.to_bytes(variables))

    rc = main(["--model", str(art), "--size", "32", "--grid", "2",
               "--noise-std", "10", "--mass-radius", "6",
               "--output-dir", str(tmp_path / "figs")])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert len(report["filters"]) == 4
    assert report["noise_std"] == 10.0
    figs = tmp_path / "figs"
    assert (figs / "filters.png").is_file()
    assert (figs / "bias_map.png").is_file()


def test_adaptive_filters_rejects_out_of_bounds_pixel():
    """JAX clamps/drops OOB gather/scatter indices silently — the tool
    must raise instead of returning a wrong all-zero filter."""
    den = _tiny_denoiser()
    fwd = analysis.forward_from_denoiser(den)
    x = _rng_image(shape=(16, 16, 3), seed=17)
    with pytest.raises(ValueError, match="outside image"):
        analysis.adaptive_filters(fwd, x, [(16, 3)])
    # same hazard for the channel index: OOB scatter would silently
    # produce all-zero filters with nonsense bias/weight_sum
    with pytest.raises(ValueError, match="channel"):
        analysis.adaptive_filters(fwd, x, [(8, 8)], channel=3)
    with pytest.raises(ValueError, match="channel"):
        analysis.adaptive_filters(fwd, x, [(8, 8)], channel=-4)
    # NumPy-style negative indexing is normalized, not rejected
    r_neg = analysis.adaptive_filters(fwd, x, [(8, 8)], channel=-1)
    r_pos = analysis.adaptive_filters(fwd, x, [(8, 8)], channel=2)
    np.testing.assert_array_equal(r_neg.filters, r_pos.filters)


def test_net_bias_map_fallback_engages_on_custom_vjp():
    """Pin the double-vjp fallback against a custom-VJP forward (the
    flagship's FastLayerNorm situation): jvp raises TypeError, the
    fallback must engage REGARDLESS of the error message wording
    (ADVICE r3) and agree with the analytic Jacobian; a genuine user
    TypeError must still surface, not be masked."""
    c = analysis.DEFAULT_CENTER

    @jax.custom_vjp
    def scale_only(x):
        return (x - c) * 0.25 + c

    def _fwd(x):
        return scale_only(x), None

    def _bwd(_, g):
        return (g * 0.25,)

    scale_only.defvjp(_fwd, _bwd)

    x = _rng_image(shape=(8, 8, 3), seed=23)
    y, bias = analysis.net_bias_map(scale_only, x)
    # affine-around-center: J·(x−c) = y−c exactly ⇒ zero net bias
    np.testing.assert_allclose(bias, 0.0, atol=1e-4)
    np.testing.assert_allclose(y, (x - c) * 0.25 + c, atol=1e-4)

    def broken(x):
        raise TypeError("user bug, not a custom-VJP limitation")

    with pytest.raises(TypeError, match="user bug"):
        analysis.net_bias_map(broken, x)


def test_adaptive_filters_through_tta_ensemble():
    """float_forward covers the TTA pipeline too: filter rows extracted
    through the 8-way dihedral ensemble still match jvp directional
    derivatives (the ensemble is differentiable end to end)."""
    hydra, variables = tiny_resnet_hydra()
    den = Denoiser(hydra, variables, pad_multiple=8, tta=True)
    fwd = analysis.forward_from_denoiser(den)
    x = _rng_image(shape=(16, 16, 3), seed=19)
    res = analysis.adaptive_filters(fwd, x, [(8, 8)], channel=2)
    v = np.random.default_rng(20).normal(size=x.shape).astype(np.float32)
    _, jv = jax.jvp(fwd, (jnp.asarray(x),), (jnp.asarray(v),))
    np.testing.assert_allclose(
        float((res.filters[0] * v).sum()), np.asarray(jv)[8, 8, 2],
        rtol=1e-3, atol=1e-4)
