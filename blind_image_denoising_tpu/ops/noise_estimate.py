"""Blind per-image noise-level estimation.

Immerkaer's fast noise-variance estimator (J. Immerkaer, "Fast Noise
Variance Estimation", CVIU 1996) made robust with a median absolute
deviation: convolve with the difference-of-Laplacians stencil

        [ 1 -2  1]
    N = [-2  4 -2]
        [ 1 -2  1]

whose response annihilates locally-linear image structure (it is the
discrete biharmonic mask), leaving mostly the noise. For i.i.d. noise of
std sigma the response std is ||N||_2 * sigma = 6 sigma, and the median
of |N(0, s)| is 0.674490 s, so

    sigma_hat = median(|x * N|) / (6 * 0.674490)

The median (rather than Immerkaer's mean-of-abs) keeps edges and texture
— which produce a sparse heavy tail in the response — from inflating the
estimate. Residual content bias (upward on textured images, and the
truncated-normal corruption's 0.88 std factor) is absorbed downstream:
the adaptive-blend calibration (inference/blend.py) maps MEASURED
sigma_hat values on real frames to blend weights, so only the estimator's
monotonicity and stability matter, not its absolute scale.

The reference has no blind noise estimation; its models are served
as-is at every noise level (reference module_denoiser.py:46-73). This op
exists to make the denoiser identity-consistent as sigma -> 0 — the
regime where any trained model's reconstruction-error floor exceeds the
noise itself.
"""

import jax.numpy as jnp

# median(|N(0,1)|): the 0.75 quantile of the standard normal
_MAD_TO_STD = 0.6744897501960817
# L2 norm of the 3x3 biharmonic stencil
_STENCIL_NORM = 6.0


def laplacian_response(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H-2, W-2, C] response of the biharmonic
    stencil, computed as shifted adds (cheaper than a conv and fuses
    into one VPU pass)."""
    c = x[:, 1:-1, 1:-1, :]
    up, dn = x[:, :-2, 1:-1, :], x[:, 2:, 1:-1, :]
    lf, rt = x[:, 1:-1, :-2, :], x[:, 1:-1, 2:, :]
    ul, ur = x[:, :-2, :-2, :], x[:, :-2, 2:, :]
    dl, dr = x[:, 2:, :-2, :], x[:, 2:, 2:, :]
    return 4.0 * c - 2.0 * (up + dn + lf + rt) + (ul + ur + dl + dr)


def estimate_sigma(x: jnp.ndarray) -> jnp.ndarray:
    """Blind per-image noise-std estimate.

    x: [B, H, W, C] (or [H, W, C]) float in [0, 255].
    Returns [B] (or scalar) float32 sigma_hat in gray levels.
    Jittable; the median lowers to a sort over the (H-2)(W-2)C response,
    negligible next to a model forward."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    if x.shape[1] < 3 or x.shape[2] < 3:
        # the 3x3 stencil has no valid support: the response would be
        # empty and its median NaN, which BlendTable.apply would then
        # propagate into the served output. Shapes are static under jit,
        # so raising here is trace-time and loud.
        raise ValueError(
            f"estimate_sigma needs H, W >= 3 for the 3x3 stencil, got "
            f"spatial dims {x.shape[1]}x{x.shape[2]}")
    r = laplacian_response(x.astype(jnp.float32))
    b = r.shape[0]
    mad = jnp.median(jnp.abs(r.reshape(b, -1)), axis=1)
    sigma = mad / (_STENCIL_NORM * _MAD_TO_STD)
    return sigma[0] if squeeze else sigma
