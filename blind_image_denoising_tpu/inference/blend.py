"""Noise-adaptive input blending: a calibrated identity path for low noise.

Every trained denoiser has a reconstruction-error floor (blur, lost
texture). Below some noise level the floor EXCEEDS the noise, so serving
the raw model output makes the image worse than the input — the
reference serves its models unconditionally at every level (reference
module_denoiser.py:46-73) and its own README table shows denoised MAE
above noisy MAE at sigma <= 5 (reference README.md:83-86).

This module closes that regime while staying blind: estimate the noise
level from the INPUT itself (ops/noise_estimate.py — robust Immerkaer
estimator), then serve a convex combination

    output = alpha(sigma_hat) * model(x) + (1 - alpha(sigma_hat)) * x

where alpha(.) is a piecewise-linear curve CALIBRATED per artifact:
for each noise level in a sweep over calibration frames, the alpha
minimizing the blend's true MAE is solved by direct grid search, keyed
by the sigma_hat actually measured on those frames (so estimator bias —
image texture, the truncated-normal corruption's std factor — is folded
into the curve instead of assumed away). At sigma -> 0 calibration drives
alpha -> 0 (identity: the floor is pure loss) and at high sigma
alpha -> 1 (the model already beats the input by 4x), so the blend is a
strict superset of the unblended behavior with one extra VPU pass and a
median. The curve ships as ``blend.json`` next to ``params.msgpack`` and
is served via ``load_model(..., blend=True)``.

Because alpha enters linearly, the blended denoiser's exact adaptive
filter (analysis.py) is alpha * F_model + (1 - alpha) * identity — the
interpretability story composes.

Per-image ADAPTIVE refinement (round 5): a single alpha per noise level
cannot adapt to content difficulty — the per-image MAE-optimal alpha
spans [0.02, 0.98] across crops at sigma=5 (scripts/oracle_blend.py),
because on textured content the model destroys detail (want alpha low)
while on smooth content it cleanly denoises (want alpha high). The
MSE-optimal per-image weight has a closed blind form: with d = y - x
and err(alpha) = n + alpha*d,

    alpha* = -<n, d> / ||d||^2
           = (N*sigma^2 - <n, y>) / ||d||^2      (<n, x> = N*sigma^2)
           = N*sigma^2 (1 - rho) / ||d||^2,      rho = <n, y>/(N*sigma^2)

where rho — the denoiser's noise-retention factor (Stein/SURE: E<n,y> =
sigma^2 E[div y]) — is a property of the FILTER, nearly content-
independent, so it calibrates offline per artifact instead of needing
the Monte-Carlo divergence probe (no extra forward pass at serving).
The served weight is alpha_i = clip(C(sigma_hat_i) * N * sigma_hat_i^2
/ ||d_i||^2, 0, 1), with C(.) one calibrated curve folding rho, the
sigma_hat estimator bias, AND the MSE->MAE correction (fit by direct
grid search like the global mode). The per-image signal enters through
||d_i||^2: large model-induced change at a given sigma_hat means
detail destruction, driving alpha down exactly as the oracle does.
Tables with a ``coef`` array serve this adaptive path.

Two-band refinement (round 4): a single global alpha must trade the
WHOLE image between input and model, but the two error sources live at
different frequencies — white readout noise is spectrally flat while
image power concentrates at low frequency, so the input's LOW band is
nearly clean even at moderate sigma, and the model's reconstruction
error (blur, texture loss, color drift) is what corrupts ITS low band.
Splitting with the packaged depthwise Gaussian (ops/gaussian.py, the
same op the GaussianFilter layer wraps) and blending the bands with
independent calibrated curves

    l = G*x,  out = alpha_low(s)  * G*y + (1-alpha_low(s))  * G*x
            +  alpha_high(s) * (y-G*y) + (1-alpha_high(s)) * (x-G*x)

strictly generalizes the global blend (alpha_low == alpha_high
recovers it exactly, so calibration can only improve) and stays linear
in (x, y) — the adaptive-filter decomposition still composes. Tables
with an ``alpha_low`` array serve the two-band path; v1 tables keep
working unchanged.
"""

import json
import os
from typing import Callable, Dict, Optional, Sequence, Union

import numpy as np
import jax.numpy as jnp

from ..logger import logger

BLEND_FILE = "blend.json"

# the estimator this table was calibrated against; bump if the stencil
# or the robust statistic ever changes, so stale tables fail loudly
ESTIMATOR = "immerkaer_median_v1"

# the band-split low-pass (two-band tables): depthwise Gaussian, same
# parametrization as the packaged GaussianFilter layer defaults
BAND_KERNEL = 5
BAND_NSIG = 2.0


class BlendTable:
    """Piecewise-linear alpha(sigma_hat) with clamped ends; optionally a
    second ``alpha_low`` curve for the two-band (Gaussian-split) blend."""

    def __init__(self, sigma_knots: Sequence[float],
                 alpha_knots: Sequence[float],
                 alpha_low_knots: Optional[Sequence[float]] = None,
                 coef_knots: Optional[Sequence[float]] = None,
                 meta: Optional[Dict] = None):
        s = np.asarray(sigma_knots, np.float32)
        a = np.asarray(alpha_knots, np.float32)
        if s.ndim != 1 or s.shape != a.shape or s.size < 2:
            raise ValueError(
                f"blend table needs matching 1-D knot arrays of >=2 "
                f"entries, got sigma {s.shape} alpha {a.shape}")
        al = None
        if alpha_low_knots is not None:
            al = np.asarray(alpha_low_knots, np.float32)
            if al.shape != s.shape:
                raise ValueError(
                    f"alpha_low knots {al.shape} must match sigma_hat "
                    f"knots {s.shape}")
        co = None
        if coef_knots is not None:
            co = np.asarray(coef_knots, np.float32)
            if co.shape != s.shape:
                raise ValueError(
                    f"coef knots {co.shape} must match sigma_hat "
                    f"knots {s.shape}")
            if np.any(co < 0.0):
                raise ValueError("coef knots must be >= 0")
        order = np.argsort(s, kind="stable")
        s, a = s[order], a[order]
        al = al[order] if al is not None else None
        co = co[order] if co is not None else None
        if not np.all(np.diff(s) >= 0):
            raise ValueError("sigma_hat knots must be sortable")
        if np.any((a < 0.0) | (a > 1.0)) or (
                al is not None and np.any((al < 0.0) | (al > 1.0))):
            raise ValueError("alpha knots must lie in [0, 1]")
        self.sigma_knots = s
        self.alpha_knots = a
        self.alpha_low_knots = al
        self.coef_knots = co
        self.meta = dict(meta or {})
        est = self.meta.setdefault("estimator", ESTIMATOR)
        if est != ESTIMATOR:
            raise ValueError(
                f"blend table calibrated for estimator [{est}]; this "
                f"build serves [{ESTIMATOR}] — recalibrate "
                f"(scripts/calibrate_blend.py)")

    @classmethod
    def from_any(cls, spec: Union["BlendTable", Dict, str]) -> "BlendTable":
        if isinstance(spec, BlendTable):
            return spec
        if isinstance(spec, dict):
            return cls(spec["sigma_hat"], spec["alpha"],
                       alpha_low_knots=spec.get("alpha_low"),
                       coef_knots=spec.get("coef"),
                       meta={k: v for k, v in spec.items()
                             if k not in ("sigma_hat", "alpha",
                                          "alpha_low", "coef")})
        if isinstance(spec, (str, os.PathLike)):
            path = str(spec)
            if os.path.isdir(path):
                path = os.path.join(path, BLEND_FILE)
            with open(path, "r") as f:
                return cls.from_any(json.load(f))
        raise TypeError(f"cannot build a BlendTable from {type(spec)!r}")

    def to_dict(self) -> Dict:
        d = dict(self.meta)
        d["sigma_hat"] = [float(v) for v in self.sigma_knots]
        d["alpha"] = [float(v) for v in self.alpha_knots]
        if self.alpha_low_knots is not None:
            d["alpha_low"] = [float(v) for v in self.alpha_low_knots]
        if self.coef_knots is not None:
            d["coef"] = [float(v) for v in self.coef_knots]
        return d

    def save(self, path: str) -> str:
        if os.path.isdir(path):
            path = os.path.join(path, BLEND_FILE)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=1)
        logger.info(f"wrote blend table to [{path}]")
        return path

    def alpha(self, sigma_hat: jnp.ndarray) -> jnp.ndarray:
        """alpha (high band in two-band tables) for (a batch of)
        sigma_hat values; ends clamp."""
        return jnp.interp(sigma_hat, jnp.asarray(self.sigma_knots),
                          jnp.asarray(self.alpha_knots))

    def alpha_low(self, sigma_hat: jnp.ndarray) -> jnp.ndarray:
        if self.alpha_low_knots is None:
            return self.alpha(sigma_hat)
        return jnp.interp(sigma_hat, jnp.asarray(self.sigma_knots),
                          jnp.asarray(self.alpha_low_knots))

    def band_split(self, x: jnp.ndarray) -> jnp.ndarray:
        """The table's low band of x (the SAME op at calibration and
        serving time — kernel/nsig travel in meta)."""
        from ..ops.gaussian import gaussian_blur
        k = int(self.meta.get("band_kernel", BAND_KERNEL))
        nsig = float(self.meta.get("band_nsig", BAND_NSIG))
        return gaussian_blur(x, (k, k), (nsig, nsig))

    def apply(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Blend model output y toward input x by the calibrated
        per-image weight(s). x, y: [B, H, W, C] float32 in [0, 255]."""
        from jax import lax
        from ..ops.noise_estimate import estimate_sigma
        # WORKAROUND (round 5): when the serving program converts a
        # uint8 input and feeds it STRAIGHT into this blend's ops, the
        # axon TPU backend miscompiles the fused convert(+conv) — the
        # served two-band output measured MAE 81.6 vs the correct 3.5
        # on identical inputs (bisect: uint8-in/float-out broken,
        # float-in/uint8-out correct, barrier'd uint8 correct,
        # CPU always correct). The barrier pins x as a materialized f32
        # value; it is the identity (and differentiable) otherwise.
        x = lax.optimization_barrier(x)
        s_hat = estimate_sigma(x)
        shape = (-1,) + (1,) * (y.ndim - 1)
        if self.coef_knots is not None:
            # per-image ADAPTIVE weight (module docstring): alpha_i =
            # max(alpha_floor(s_hat_i),
            #     clip(C(s_hat_i) * N * s_hat_i^2 / ||y_i - x_i||^2)).
            # ||d||^2 is the per-image signal: at a given s_hat, a large
            # model-induced change means detail destruction -> alpha
            # drops; a change of exactly noise scale -> alpha ~ 1. The
            # jointly-calibrated floor (stored in the alpha knots)
            # saturates to 1 at high sigma, where the model always wins
            # and the r statistic does not transfer across content
            # domains (measured: pure clip(C*r) regressed sigma>=20).
            d = (y - x).astype(jnp.float32)
            n_px = float(np.prod(d.shape[1:]))
            dd = jnp.sum(jnp.square(d), axis=tuple(range(1, d.ndim)))
            c = jnp.interp(s_hat, jnp.asarray(self.sigma_knots),
                           jnp.asarray(self.coef_knots))
            r = n_px * jnp.square(s_hat) / jnp.maximum(dd, 1e-6)
            a = jnp.maximum(self.alpha(s_hat),
                            jnp.clip(c * r, 0.0, 1.0))
            a = a.reshape(shape).astype(y.dtype)
            return a * y + (1.0 - a) * x
        a = self.alpha(s_hat).reshape(shape).astype(y.dtype)
        if self.alpha_low_knots is None:
            return a * y + (1.0 - a) * x
        al = self.alpha_low(s_hat).reshape(shape).astype(y.dtype)
        lx, ly = self.band_split(x), self.band_split(y)
        return (al * ly + (1.0 - al) * lx
                + a * (y - ly) + (1.0 - a) * (x - lx))


def _optimal_alpha(err_in: np.ndarray, err_out: np.ndarray,
                   grid: int) -> float:
    """argmin over alpha in [0, 1] of mean |a*err_out + (1-a)*err_in| —
    the blend's true MAE, solved exactly on the calibration set by
    direct search (the objective is convex in alpha, so the grid
    resolution bounds the error)."""
    alphas = np.linspace(0.0, 1.0, grid, dtype=np.float32)
    best_a, best_m = 0.0, np.inf
    for a in alphas:
        m = float(np.abs(a * err_out + (1.0 - a) * err_in).mean())
        if m < best_m:
            best_a, best_m = float(a), m
    return best_a


def _optimal_alpha2(err_in: np.ndarray, d_low: np.ndarray,
                    d_high: np.ndarray, grid: int):
    """argmin over (alpha_low, alpha_high) in [0, 1]^2 of
    mean |err_in + a_l*d_low + a_h*d_high| (the exact two-band blend
    error: d_* = band of (err_out - err_in)). The objective is jointly
    convex; a coarse grid seeds a local window that RE-CENTERS on its own
    argmin until the argmin is interior (or clamped at the [0,1] box), so
    an elongated diagonal valley whose optimum sits outside the first
    window cannot strand the search — then the window halves down to the
    requested grid resolution."""
    def sweep(als, ahs):
        best = (0.0, 0.0, np.inf)
        for al in als:
            base = err_in + al * d_low
            for ah in ahs:
                m = float(np.abs(base + ah * d_high).mean())
                if m < best[2]:
                    best = (float(al), float(ah), m)
        return best

    def window(center, half, step):
        lo = np.clip(center - half, 0.0, 1.0)
        hi = np.clip(center + half, 0.0, 1.0)
        # arange's endpoint slack can overshoot hi — clip back into the
        # box, or the sweep returns an alpha slightly above 1.0
        return np.clip(np.arange(lo, hi + step / 2, step,
                                 dtype=np.float32), 0.0, 1.0)

    coarse = np.linspace(0.0, 1.0, 21, dtype=np.float32)   # 0.05 steps
    al, ah, m = sweep(coarse, coarse)
    target = 1.0 / max(grid - 1, 1)
    half, step = 0.05, 0.05
    for _ in range(64):  # bounded walk: 64 re-centers spans [0,1] twice
        als, ahs = window(al, half, step), window(ah, half, step)
        al, ah, m = sweep(als, ahs)
        on_edge = ((al in (als[0], als[-1]) and 0.0 < al < 1.0) or
                   (ah in (ahs[0], ahs[-1]) and 0.0 < ah < 1.0))
        if on_edge:
            continue          # valley extends past the window: re-center
        if step <= target:
            break             # interior at target resolution: done
        half, step = half / 2, max(step / 2, target)
    return al, ah, m


def calibrate_blend(
        float_forward: Callable[[np.ndarray], jnp.ndarray],
        images: np.ndarray,
        stds: Sequence[float] = (0, 1, 2, 3, 5, 8, 12, 16, 20, 25,
                                 30, 40, 50, 65, 80),
        seed: int = 0,
        alpha_grid: int = 101,
        bands: int = 1,
        band_kernel: int = BAND_KERNEL,
        band_nsig: float = BAND_NSIG,
        adaptive: bool = False) -> BlendTable:
    """Calibrate alpha(sigma_hat) for one artifact.

    float_forward: the Denoiser's ``float_forward`` (no rounding — the
    calibration optimizes the same float blend the serving path computes).
    images: [N, H, W, C] float32 CLEAN calibration frames in [0, 255] —
    use training-split frames, never the evaluation set.

    For each std: corrupt with the README-protocol truncated normal,
    record the mean measured sigma_hat and the MAE-optimal alpha; knots
    are (sigma_hat, alpha) pairs. Dense stds at the low end, where the
    curve transitions. ``bands=2`` calibrates independent low/high-band
    curves around the depthwise-Gaussian split (module docstring).
    ``adaptive=True`` calibrates the per-image mode instead: per level,
    the scalar C minimizing the calibration MAE of
    alpha_i = clip(C * N * sigma_hat_i^2 / ||d_i||^2, 0, 1) — the
    blind MSE-optimal weight with noise retention, estimator bias, and
    the MSE->MAE correction folded into C (module docstring)."""
    import jax.random as jrandom
    from ..ops.gaussian import gaussian_blur
    from ..ops.noise import corrupt_batch_fixed_std
    from ..ops.noise_estimate import estimate_sigma

    if bands not in (1, 2):
        raise ValueError(f"bands must be 1 or 2, got {bands}")
    if adaptive and bands != 1:
        raise ValueError("adaptive mode is single-band")
    clean = np.asarray(images, np.float32)
    sig_knots, a_knots, al_knots, co_knots, records = [], [], [], [], []
    for i, std in enumerate(sorted(set(float(s) for s in stds))):
        if std > 0:
            noisy = np.clip(np.asarray(corrupt_batch_fixed_std(
                jrandom.fold_in(jrandom.PRNGKey(seed), i),
                clean, std=std)), 0, 255)
        else:
            noisy = clean
        s_hat = float(np.asarray(estimate_sigma(
            jnp.asarray(noisy))).mean())
        den = np.asarray(float_forward(noisy), np.float32)
        err_in, err_out = noisy - clean, den - clean
        rec = {"std": std, "sigma_hat": s_hat,
               "mae_noisy": float(np.abs(err_in).mean()),
               "mae_model": float(np.abs(err_out).mean())}
        if adaptive:
            s_hat_i = np.asarray(estimate_sigma(jnp.asarray(noisy)),
                                 np.float32)           # per image [B]
            d = err_out - err_in                       # = y - x
            n_px = float(np.prod(d.shape[1:]))
            dd = np.maximum((d * d).sum(axis=(1, 2, 3)), 1e-6)
            r_i = n_px * s_hat_i ** 2 / dd             # observable
            # per-image MAE as a function of alpha, precomputed once on
            # a grid — then the joint (floor g, coef C) search is pure
            # table lookups (alpha_i = max(g, clip(C * r_i)))
            agrid = np.linspace(0.0, 1.0, alpha_grid, dtype=np.float32)
            mae_tab = np.stack([
                np.abs(err_in[j][None] + agrid[:, None, None, None]
                       * d[j][None]).mean(axis=(1, 2, 3))
                for j in range(d.shape[0])])           # [B, grid]
            best = (0.0, 0.0, np.inf)                  # (g, C, mae)
            for g in np.linspace(0.0, 1.0, 51):
                for cand in np.linspace(0.0, 3.0, 61):
                    a_i = np.maximum(g, np.clip(cand * r_i, 0.0, 1.0))
                    idx = np.round(a_i * (alpha_grid - 1)).astype(int)
                    m = float(mae_tab[np.arange(len(idx)), idx].mean())
                    if m < best[2]:
                        best = (float(g), float(cand), m)
            g, best_c, best_m = best
            # saturation rule (declared a priori, in-sample only): when
            # even the optimal (floor, C) buys < 0.005 MAE over the raw
            # model on the calibration set, the blend has nothing to
            # offer at this level — pin alpha to 1 (exact model output)
            # rather than letting an overfit C wobble held-out content
            if best_m >= rec["mae_model"] - 0.005:
                g, best_c = 1.0, 0.0
            co_knots.append(best_c)
            a = g                                      # the floor knot
            al = None
            rec["mae_blend"] = best_m
            rec["coef"] = best_c
            rec["alpha_floor"] = g
            rec["r_mean"] = float(r_i.mean())
        elif bands == 1:
            a = _optimal_alpha(err_in, err_out, alpha_grid)
            al = None
        else:
            d = err_out - err_in
            d_low = np.asarray(gaussian_blur(
                jnp.asarray(d), (band_kernel, band_kernel),
                (band_nsig, band_nsig)), np.float32)
            a_lo, a, m = _optimal_alpha2(err_in, d_low, d - d_low,
                                         alpha_grid)
            al = a_lo
            rec["mae_blend"] = m
            al_knots.append(al)
        sig_knots.append(s_hat)
        a_knots.append(a)
        rec["alpha"] = a
        if al is not None:
            rec["alpha_low"] = al
        records.append(rec)
        logger.info(
            f"calibrate std {std:g}: sigma_hat {s_hat:.2f} alpha* {a:.2f}"
            + (f" alpha_low* {al:.2f} mae {rec['mae_blend']:.3f}"
               if al is not None else "")
            + (f" coef* {rec['coef']:.2f} mae {rec['mae_blend']:.3f}"
               if adaptive else ""))
    meta = {"estimator": ESTIMATOR,
            "alpha_grid": alpha_grid,
            "seed": seed,
            "n_images": int(clean.shape[0]),
            "image_hw": list(clean.shape[1:3]),
            "levels": records}
    if bands == 2:
        meta["band_kernel"] = int(band_kernel)
        meta["band_nsig"] = float(band_nsig)
    return BlendTable(sig_knots, a_knots,
                      alpha_low_knots=al_knots if bands == 2 else None,
                      coef_knots=co_knots if adaptive else None,
                      meta=meta)
