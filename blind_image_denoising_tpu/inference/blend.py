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


class BlendTable:
    """Piecewise-linear alpha(sigma_hat) with clamped ends."""

    def __init__(self, sigma_knots: Sequence[float],
                 alpha_knots: Sequence[float],
                 meta: Optional[Dict] = None):
        s = np.asarray(sigma_knots, np.float32)
        a = np.asarray(alpha_knots, np.float32)
        if s.ndim != 1 or s.shape != a.shape or s.size < 2:
            raise ValueError(
                f"blend table needs matching 1-D knot arrays of >=2 "
                f"entries, got sigma {s.shape} alpha {a.shape}")
        order = np.argsort(s, kind="stable")
        s, a = s[order], a[order]
        if not np.all(np.diff(s) >= 0):
            raise ValueError("sigma_hat knots must be sortable")
        if np.any((a < 0.0) | (a > 1.0)):
            raise ValueError("alpha knots must lie in [0, 1]")
        self.sigma_knots = s
        self.alpha_knots = a
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
                       meta={k: v for k, v in spec.items()
                             if k not in ("sigma_hat", "alpha")})
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
        return d

    def save(self, path: str) -> str:
        if os.path.isdir(path):
            path = os.path.join(path, BLEND_FILE)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=1)
        logger.info(f"wrote blend table to [{path}]")
        return path

    def alpha(self, sigma_hat: jnp.ndarray) -> jnp.ndarray:
        """alpha for (a batch of) sigma_hat values; ends clamp."""
        return jnp.interp(sigma_hat, jnp.asarray(self.sigma_knots),
                          jnp.asarray(self.alpha_knots))

    def apply(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Blend model output y toward input x by the calibrated
        per-image weight. x, y: [B, H, W, C] float32 in [0, 255]."""
        from ..ops.noise_estimate import estimate_sigma
        a = self.alpha(estimate_sigma(x))
        a = a.reshape((-1,) + (1,) * (y.ndim - 1)).astype(y.dtype)
        return a * y + (1.0 - a) * x


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


def calibrate_blend(
        float_forward: Callable[[np.ndarray], jnp.ndarray],
        images: np.ndarray,
        stds: Sequence[float] = (0, 1, 2, 3, 5, 8, 12, 16, 20, 25,
                                 30, 40, 50, 65, 80),
        seed: int = 0,
        alpha_grid: int = 101) -> BlendTable:
    """Calibrate alpha(sigma_hat) for one artifact.

    float_forward: the Denoiser's ``float_forward`` (no rounding — the
    calibration optimizes the same float blend the serving path computes).
    images: [N, H, W, C] float32 CLEAN calibration frames in [0, 255] —
    use training-split frames, never the evaluation set.

    For each std: corrupt with the README-protocol truncated normal,
    record the mean measured sigma_hat and the MAE-optimal alpha; knots
    are (sigma_hat, alpha) pairs. Dense stds at the low end, where the
    curve transitions."""
    import jax.random as jrandom
    from ..ops.noise import corrupt_batch_fixed_std
    from ..ops.noise_estimate import estimate_sigma

    clean = np.asarray(images, np.float32)
    sig_knots, a_knots, records = [], [], []
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
        a = _optimal_alpha(noisy - clean, den - clean, alpha_grid)
        sig_knots.append(s_hat)
        a_knots.append(a)
        records.append({"std": std, "sigma_hat": s_hat, "alpha": a,
                        "mae_noisy": float(np.abs(noisy - clean).mean()),
                        "mae_model": float(np.abs(den - clean).mean())})
        logger.info(f"calibrate std {std:g}: sigma_hat {s_hat:.2f} "
                    f"alpha* {a:.2f}")
    return BlendTable(sig_knots, a_knots,
                      meta={"estimator": ESTIMATOR,
                            "alpha_grid": alpha_grid,
                            "seed": seed,
                            "n_images": int(clean.shape[0]),
                            "image_hw": list(clean.shape[1:3]),
                            "levels": records})
