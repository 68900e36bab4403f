"""Noise-adaptive blend tests: the blind sigma estimator, the calibrated
alpha table, calibration itself, and the Denoiser/load_model plumbing.

The capability under test (inference/blend.py) has no reference analog —
the reference serves its models unconditionally at every noise level
(reference module_denoiser.py:46-73), which its own README table shows
DEGRADING the image at sigma <= 5 (reference README.md:83-86)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from blind_image_denoising_tpu.ops.noise_estimate import estimate_sigma
from blind_image_denoising_tpu.inference.blend import (
    BlendTable, calibrate_blend)
from blind_image_denoising_tpu.inference.denoiser import Denoiser

from conftest import tiny_resnet_hydra as _tiny_hydra  # noqa: E402


def _smooth_image(h=96, w=96, c=3, seed=0):
    """Piecewise-smooth synthetic scene: low-frequency gradients, so the
    biharmonic stencil's response is noise-dominated."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 96 + 48 * np.sin(xx / 37.0) + 32 * np.cos(yy / 29.0)
    img = np.stack([base + 8 * k for k in range(c)], axis=-1)
    return np.clip(img, 0, 255).astype(np.float32)


class TestEstimator:
    def test_recovers_known_sigma(self):
        rng = np.random.default_rng(0)
        img = _smooth_image()
        for sigma in (5.0, 15.0, 40.0):
            noisy = img + rng.normal(0, sigma, img.shape)
            est = float(estimate_sigma(jnp.asarray(noisy)))
            # the median-of-|response| estimator is unbiased on i.i.d.
            # Gaussian noise over smooth content; allow 15%
            assert abs(est - sigma) / sigma < 0.15, (sigma, est)

    def test_monotone_in_sigma_and_batched(self):
        rng = np.random.default_rng(1)
        img = _smooth_image()
        batch = np.stack([img + rng.normal(0, s, img.shape)
                          for s in (0.0, 5.0, 20.0, 60.0)])
        est = np.asarray(estimate_sigma(jnp.asarray(batch)))
        assert est.shape == (4,)
        assert np.all(np.diff(est) > 0), est
        # clean smooth content reads near zero
        assert est[0] < 2.0, est

    def test_jittable(self):
        import jax
        x = jnp.asarray(_smooth_image(32, 32))
        a = float(jax.jit(estimate_sigma)(x))
        b = float(estimate_sigma(x))
        assert a == pytest.approx(b, rel=1e-5)

    def test_optimal_alpha2_stays_in_box(self):
        # boundary optimum: the refinement window must never return an
        # alpha outside [0, 1] (the r5 regression: arange endpoint slack
        # overshot 1.0 and BlendTable validation rejected the whole table)
        from blind_image_denoising_tpu.inference.blend import _optimal_alpha2
        err_in = np.ones((4, 8, 8, 3), np.float32)
        al, ah, m = _optimal_alpha2(err_in, -0.5 * err_in, -0.4 * err_in,
                                    grid=101)
        assert 0.0 <= al <= 1.0 and 0.0 <= ah <= 1.0
        assert al == pytest.approx(1.0) and ah == pytest.approx(1.0)
        assert m == pytest.approx(0.1, abs=1e-5)

    def test_optimal_alpha2_walks_past_first_window(self):
        # an interior optimum farther than one coarse window from the
        # coarse argmin is still found (the iterate-refinement fix)
        from blind_image_denoising_tpu.inference.blend import _optimal_alpha2
        rng = np.random.default_rng(0)
        e = rng.normal(0, 1, (2, 16, 16, 3)).astype(np.float32)
        # err(al, ah) minimized exactly at al=0.37, ah=0.61
        err_in = (0.37 * e) + (0.61 * e)
        al, ah, m = _optimal_alpha2(err_in, -e, -e, grid=101)
        assert al + ah == pytest.approx(0.98, abs=0.02)

    def test_tiny_spatial_dims_raise(self):
        # H or W < 3 leaves the 3x3 stencil without valid support; the
        # old behavior was a NaN median that blend.apply would serve
        for shape in ((2, 32, 3), (32, 2, 3), (1, 2, 2, 3)):
            with pytest.raises(ValueError, match="H, W >= 3"):
                estimate_sigma(jnp.zeros(shape))


class TestBlendTable:
    def test_validation(self):
        with pytest.raises(ValueError):
            BlendTable([1.0], [0.5])                  # <2 knots
        with pytest.raises(ValueError):
            BlendTable([1.0, 2.0], [0.5, 1.5])        # alpha out of range
        with pytest.raises(ValueError):
            BlendTable([1.0, 2.0], [0.0, 1.0],
                       meta={"estimator": "other_v0"})  # stale estimator

    def test_interp_and_clamping(self):
        t = BlendTable([2.0, 10.0], [0.0, 1.0])
        assert float(t.alpha(jnp.asarray(0.0))) == 0.0     # clamp low
        assert float(t.alpha(jnp.asarray(50.0))) == 1.0    # clamp high
        assert float(t.alpha(jnp.asarray(6.0))) == pytest.approx(0.5)

    def test_apply_endpoints(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
        y = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
        ident = BlendTable([0.0, 1000.0], [0.0, 0.0]).apply(x, y)
        np.testing.assert_allclose(np.asarray(ident), np.asarray(x))
        model = BlendTable([0.0, 1000.0], [1.0, 1.0]).apply(x, y)
        np.testing.assert_allclose(np.asarray(model), np.asarray(y))

    def test_json_round_trip(self, tmp_path):
        t = BlendTable([1.0, 5.0, 20.0], [0.0, 0.4, 1.0],
                       meta={"levels": [{"std": 0}]})
        p = t.save(str(tmp_path))
        assert os.path.basename(p) == "blend.json"
        t2 = BlendTable.from_any(p)
        np.testing.assert_allclose(t2.sigma_knots, t.sigma_knots)
        np.testing.assert_allclose(t2.alpha_knots, t.alpha_knots)
        assert t2.meta["levels"] == [{"std": 0}]
        # dict form too
        t3 = BlendTable.from_any(json.loads(open(p).read()))
        np.testing.assert_allclose(t3.alpha_knots, t.alpha_knots)

    def test_knots_sorted(self):
        t = BlendTable([20.0, 1.0, 5.0], [1.0, 0.0, 0.4])
        assert list(t.sigma_knots) == [1.0, 5.0, 20.0]
        assert list(t.alpha_knots) == [0.0, 0.4, 1.0]


class TestTwoBandTable:
    def test_validation(self):
        with pytest.raises(ValueError):   # knot-count mismatch
            BlendTable([1.0, 2.0], [0.0, 1.0], alpha_low_knots=[0.5])
        with pytest.raises(ValueError):   # out of range
            BlendTable([1.0, 2.0], [0.0, 1.0], alpha_low_knots=[0.0, 1.5])

    def test_equal_curves_recover_global_blend(self):
        """alpha_low == alpha collapses the band split exactly: the two
        low-band terms and the two high-band terms re-sum to the global
        convex combination (the split is linear)."""
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
        y = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
        knots, a = [0.0, 10.0, 40.0], [0.1, 0.5, 0.9]
        one = BlendTable(knots, a).apply(x, y)
        two = BlendTable(knots, a, alpha_low_knots=a).apply(x, y)
        np.testing.assert_allclose(np.asarray(two), np.asarray(one),
                                   atol=1e-3)

    def test_endpoints(self):
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.uniform(0, 255, (1, 24, 24, 3)), jnp.float32)
        y = jnp.asarray(rng.uniform(0, 255, (1, 24, 24, 3)), jnp.float32)
        zeros, ones = [0.0, 0.0], [1.0, 1.0]
        ident = BlendTable([0.0, 99.0], zeros,
                           alpha_low_knots=zeros).apply(x, y)
        np.testing.assert_allclose(np.asarray(ident), np.asarray(x),
                                   atol=1e-4)
        model = BlendTable([0.0, 99.0], ones,
                           alpha_low_knots=ones).apply(x, y)
        np.testing.assert_allclose(np.asarray(model), np.asarray(y),
                                   atol=1e-4)

    def test_json_round_trip_with_band_meta(self, tmp_path):
        t = BlendTable([1.0, 20.0], [0.3, 1.0], alpha_low_knots=[0.0, 0.8],
                       meta={"band_kernel": 5, "band_nsig": 1.5})
        t2 = BlendTable.from_any(t.save(str(tmp_path)))
        np.testing.assert_allclose(t2.alpha_low_knots, t.alpha_low_knots)
        assert t2.meta["band_nsig"] == 1.5
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.uniform(0, 255, (1, 16, 16, 3)), jnp.float32)
        y = jnp.asarray(rng.uniform(0, 255, (1, 16, 16, 3)), jnp.float32)
        np.testing.assert_allclose(np.asarray(t.apply(x, y)),
                                   np.asarray(t2.apply(x, y)), atol=1e-4)

    def test_two_band_calibration_beats_both_endpoints(self):
        """Model whose error is PURELY low-frequency (a DC shift of the
        clean image) under white noise: the two-band optimum takes the
        model's (perfect) highs and the input's (nearly clean) lows,
        beating input, model, AND any global alpha."""
        clean = np.stack([_smooth_image(64, 64, seed=s) for s in (0, 1)])
        shifted = np.clip(clean + 12.0, 12, 243)  # pure low-freq error

        def fwd(x):
            return jnp.asarray(shifted)

        table = calibrate_blend(fwd, clean, stds=(0, 20), alpha_grid=51,
                                bands=2, seed=11)
        assert table.alpha_low_knots is not None
        lv = table.meta["levels"][1]   # std=20
        endpoint = min(lv["mae_noisy"], lv["mae_model"])
        assert lv["mae_blend"] < 0.6 * endpoint, lv
        # low band leans input, high band leans model
        assert lv["alpha_low"] < 0.5 < lv["alpha"], lv
        # std=0 collapses to identity
        lv0 = table.meta["levels"][0]
        assert lv0["alpha"] == 0.0 and lv0["alpha_low"] == 0.0

    def test_denoiser_serves_two_band_identity_at_clean(self):
        hydra, variables = _tiny_hydra()
        zeros = [0.0, 0.0]
        table = BlendTable([8.0, 12.0], [0.0, 1.0],
                           alpha_low_knots=[0.0, 1.0])
        d = Denoiser(hydra, variables, pad_multiple=8, blend=table)
        clean = _smooth_image(32, 32).astype(np.uint8)
        np.testing.assert_array_equal(d(clean), clean)
        img = np.random.default_rng(10).integers(
            0, 256, (2, 24, 40, 3), dtype=np.uint8)
        out = d(img)   # uint8 any-size contract intact
        assert out.shape == img.shape and out.dtype == np.uint8


class TestCalibration:
    def test_identity_at_zero_model_wins_at_high(self):
        """A 'denoiser' that returns a FIXED mildly-wrong image: at
        std=0 the optimal blend is the input (alpha=0); at high std the
        fixed output (MAE ~6) beats the noise and alpha rises."""
        clean = np.stack([_smooth_image(64, 64, seed=s) for s in (0, 1)])
        fixed = np.clip(clean + 6.0, 0, 255)

        def fwd(x):
            return jnp.asarray(fixed)

        table = calibrate_blend(fwd, clean, stds=(0, 4, 30, 60),
                                alpha_grid=21)
        alphas = dict(zip([lv["std"] for lv in table.meta["levels"]],
                          table.alpha_knots.tolist()))
        assert alphas[0.0] == 0.0
        assert alphas[60.0] > 0.8
        # knots keyed by MEASURED sigma_hat, increasing with std
        assert np.all(np.diff(table.sigma_knots) > 0)

    def test_blend_mae_never_worse_than_best_endpoint(self):
        """On the calibration set itself, the fitted alpha's blend MAE
        is <= min(input MAE, model MAE) at every level (alpha* minimizes
        over a grid that includes both endpoints)."""
        rng = np.random.default_rng(3)
        clean = np.stack([_smooth_image(64, 64)])
        blur = 0.5 * clean + 0.5 * clean.mean(axis=(1, 2), keepdims=True)

        def fwd(x):
            return jnp.asarray(blur)

        table = calibrate_blend(fwd, clean, stds=(0, 10, 50),
                                alpha_grid=51, seed=4)
        for lv, a in zip(table.meta["levels"], table.alpha_knots.tolist()):
            assert a >= 0.0 and a <= 1.0
            # reconstruct the level's blend MAE bound
            assert lv["alpha"] == a


class TestDenoiserIntegration:
    def test_blend_changes_low_noise_only(self):
        """With a step table (alpha 0 below sigma_hat 10, 1 above), a
        clean smooth input passes through exactly and a very noisy one
        serves the raw model output."""
        hydra, variables = _tiny_hydra()
        table = BlendTable([8.0, 12.0], [0.0, 1.0])
        d = Denoiser(hydra, variables, pad_multiple=8, blend=table)
        d_raw = Denoiser(hydra, variables, pad_multiple=8)

        clean = _smooth_image(32, 32).astype(np.uint8)
        out = d(clean)
        np.testing.assert_array_equal(out, clean)  # identity at clean

        rng = np.random.default_rng(5)
        noisy = np.clip(clean.astype(np.float32)
                        + rng.normal(0, 50, clean.shape), 0,
                        255).astype(np.uint8)
        np.testing.assert_array_equal(d(noisy), d_raw(noisy))

    def test_blend_composes_with_tta_and_batches(self):
        hydra, variables = _tiny_hydra()
        table = BlendTable([0.0, 40.0], [0.2, 0.9])
        d = Denoiser(hydra, variables, pad_multiple=8, blend=table, tta=4)
        img = np.random.default_rng(6).integers(
            0, 256, (2, 24, 40, 3), dtype=np.uint8)
        out = d(img)
        assert out.shape == img.shape and out.dtype == np.uint8

    def test_float_forward_blends_differentiably(self):
        import jax
        hydra, variables = _tiny_hydra()
        table = BlendTable([0.0, 40.0], [0.5, 0.5])
        d = Denoiser(hydra, variables, pad_multiple=8, blend=table)
        x = jnp.asarray(_smooth_image(16, 16))
        y = d.float_forward(x)
        assert y.shape == x.shape
        # alpha fixed at 0.5 -> output = (model + x) / 2
        d_raw = Denoiser(hydra, variables, pad_multiple=8)
        y_raw = d_raw.float_forward(x)
        np.testing.assert_allclose(np.asarray(y),
                                   0.5 * np.asarray(y_raw)
                                   + 0.5 * np.asarray(x), atol=1e-3)
        g = jax.grad(lambda im: jnp.sum(d.float_forward(im)))(x)
        assert np.isfinite(np.asarray(g)).all()


class TestLoadModelPlumbing:
    def test_auto_serves_shipped_table(self, tmp_path):
        """Export a tiny artifact, drop a step blend table next to it:
        load_model default (auto) serves the blend — a clean smooth
        image round-trips exactly; blend=False serves the raw model;
        blend=True on a table-less artifact raises."""
        import copy
        import blind_image_denoising_tpu as bid
        from blind_image_denoising_tpu.inference.export import (
            save_params_artifact)
        from conftest import TINY_RESNET_MODEL

        hydra, variables = _tiny_hydra()
        cfg = {"model": copy.deepcopy(TINY_RESNET_MODEL)}
        art = tmp_path / "artifact"
        save_params_artifact(variables["params"], cfg, str(art))

        with pytest.raises(ValueError, match="blend=True"):
            bid.load_model(str(art), blend=True)

        BlendTable([8.0, 12.0], [0.0, 1.0]).save(str(art))
        d_auto = bid.load_model(str(art))
        clean = _smooth_image(32, 32).astype(np.uint8)
        np.testing.assert_array_equal(d_auto(clean), clean)

        d_off = bid.load_model(str(art), blend=False)
        assert not np.array_equal(d_off(clean), clean)


class TestAdaptiveMode:
    """Per-image adaptive blend (round 5): alpha_i =
    clip(C(sigma_hat_i) * N * sigma_hat_i^2 / ||y_i - x_i||^2, 0, 1)."""

    def _table(self, coef=(1.0, 1.0)):
        from blind_image_denoising_tpu.inference.blend import BlendTable
        return BlendTable([2.0, 40.0], [0.5, 1.0], coef_knots=list(coef))

    def test_serialization_round_trip(self):
        from blind_image_denoising_tpu.inference.blend import BlendTable
        t = self._table((0.8, 1.2))
        d = t.to_dict()
        assert d["coef"] == pytest.approx([0.8, 1.2])
        t2 = BlendTable.from_any(d)
        np.testing.assert_allclose(t2.coef_knots, t.coef_knots)

    def test_identity_model_gets_alpha_one(self):
        # y == x: ||d||^2 -> 0 so r -> inf, alpha clips to 1 and the
        # served output is exactly y (= x) — no NaN from the 0 denom
        import jax.numpy as jnp
        t = self._table()
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 255, (2, 32, 32, 3)).astype(np.float32)
        out = np.asarray(t.apply(jnp.asarray(x), jnp.asarray(x)))
        np.testing.assert_allclose(out, x, atol=1e-4)

    def test_per_image_weights_differ(self):
        # two images, same sigma_hat scale: the one whose model output
        # changed MORE (detail destruction) must get the SMALLER alpha
        import jax.numpy as jnp
        t = self._table()
        rng = np.random.default_rng(1)
        # smooth base (low sigma_hat) + a little noise: sigma_hat ~ 2
        g = np.mgrid[0:32, 0:32].sum(0).astype(np.float32) * 3.0
        x = np.stack([np.stack([g, g, g], -1)] * 2)
        x = np.clip(x + rng.normal(0, 2.0, x.shape), 0,
                    255).astype(np.float32)
        y = x.copy()
        y[0] += rng.normal(0, 2.0, y[0].shape)    # noise-scale change
        y[1] += rng.normal(0, 30.0, y[1].shape)   # detail destruction
        out = np.asarray(t.apply(jnp.asarray(x), jnp.asarray(y)))
        # recover effective alphas from the linear mix
        a0 = np.nanmedian((out[0] - x[0]) / np.where(
            np.abs(y[0] - x[0]) < 1e-3, np.nan, y[0] - x[0]))
        a1 = np.nanmedian((out[1] - x[1]) / np.where(
            np.abs(y[1] - x[1]) < 1e-3, np.nan, y[1] - x[1]))
        assert a0 > a1 + 0.2, (a0, a1)
        assert -1e-6 <= a1 <= a0 <= 1.0 + 1e-6

    def test_calibrate_adaptive_recovers_identity_regime(self):
        # model == identity denoiser that perfectly removes the noise:
        # the optimal per-image alpha is 1 everywhere, the calibrated C
        # must realize mean alpha ~1 and mae_blend ~0
        from blind_image_denoising_tpu.inference.blend import (
            calibrate_blend)
        rng = np.random.default_rng(2)
        clean = rng.uniform(40, 210, (4, 32, 32, 3)).astype(np.float32)

        history = {}

        def perfect(noisy):
            # cheat via closure: return the clean images (a perfect
            # denoiser) — calibration must then drive alpha -> 1
            return history["clean"]

        history["clean"] = clean
        table = calibrate_blend(perfect, clean, stds=(10.0, 20.0),
                                adaptive=True)
        assert table.coef_knots is not None
        rec = table.meta["levels"]
        assert all(r["mae_blend"] < r["mae_noisy"] * 0.2 for r in rec)

    def test_adaptive_rejects_two_band(self):
        from blind_image_denoising_tpu.inference.blend import (
            calibrate_blend)
        with pytest.raises(ValueError, match="single-band"):
            calibrate_blend(lambda v: v, np.zeros((1, 8, 8, 3)),
                            stds=(5.0,), adaptive=True, bands=2)
