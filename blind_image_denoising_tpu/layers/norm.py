"""Bandwidth-lean LayerNorm.

flax's ``nn.LayerNorm(dtype=bf16)`` upcasts to float32 for the WHOLE
normalization — statistics and the full-resolution (x−μ)·rσ·γ chain — so
under bfloat16 compute the largest elementwise tensors in the model cross
fusion boundaries at 4 bytes/elem. Cost analysis of the flagship showed
bf16 mode moving 51.6 GB/batch where a clean halving of the f32 build's
78.1 GB would be 39 GB — the difference is almost entirely these f32
LayerNorm islands (docs/PERF.md; the model is bandwidth-bound, so bytes
are wall-clock). Measured effect of this module on the flagship: 51.6 →
41.1 GB/batch, inference 405 → 493 img/s (+22%).

:class:`FastLayerNorm` computes the reductions (μ, rσ — tiny [.., 1]
tensors) in float32 for stability, then casts them to the compute dtype
and performs the full-resolution normalize/scale arithmetic natively in
it. The backward pass is a custom VJP in the same style (f32 reductions,
compute-dtype elementwise) — plain autodiff of the forward emits a slower
backward than flax's. In float32 compute it matches ``nn.LayerNorm`` to
float-association tolerance.

Parameter names/shapes match ``nn.LayerNorm`` ('scale', 'bias'), so
checkpoints are interchangeable.
"""

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fast_ln(x, scale, bias, eps, cdt_name, use_scale, use_bias,
             x_dtype_name):
    y, _ = _fast_ln_fwd(x, scale, bias, eps, cdt_name, use_scale,
                        use_bias, x_dtype_name)
    return y


def _fast_ln_fwd(x, scale, bias, eps, cdt_name, use_scale, use_bias,
                 x_dtype_name):
    cdt = jnp.dtype(cdt_name)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)

    xhat = (x.astype(cdt) - mean.astype(cdt)) * rsig.astype(cdt)
    y = xhat
    if use_scale:
        y = y * scale.astype(cdt)
    if use_bias:
        y = y + bias.astype(cdt)
    return y, (xhat, rsig, scale)


def _fast_ln_bwd(eps, cdt_name, use_scale, use_bias, x_dtype_name,
                 res, g):
    cdt = jnp.dtype(cdt_name)
    xhat, rsig, scale = res
    x_dtype = jnp.dtype(x_dtype_name)
    g = g.astype(cdt)
    gs = g * scale.astype(cdt) if use_scale else g
    # f32 channel reductions (tiny [..., 1] tensors), bf16 elementwise
    m1 = jnp.mean(gs.astype(jnp.float32), axis=-1, keepdims=True)
    m2 = jnp.mean((gs * xhat).astype(jnp.float32), axis=-1, keepdims=True)
    dx = rsig.astype(cdt) * (gs - m1.astype(cdt) - xhat * m2.astype(cdt))

    reduce_axes = tuple(range(g.ndim - 1))
    dscale = (jnp.sum((g * xhat).astype(jnp.float32), axis=reduce_axes)
              if use_scale else jnp.zeros_like(scale))
    dbias = (jnp.sum(g.astype(jnp.float32), axis=reduce_axes)
             if use_bias else jnp.zeros_like(scale))
    return dx.astype(x_dtype), dscale, dbias


_fast_ln.defvjp(_fast_ln_fwd, _fast_ln_bwd)


class FastLayerNorm(nn.Module):
    epsilon: float = 1e-6
    use_scale: bool = True
    use_bias: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cdt = jnp.dtype(self.dtype or x.dtype)
        features = x.shape[-1]
        scale = (self.param("scale", nn.initializers.ones, (features,),
                            jnp.float32) if self.use_scale
                 else jnp.ones((features,), jnp.float32))
        bias = (self.param("bias", nn.initializers.zeros, (features,),
                           jnp.float32) if self.use_bias
                else jnp.zeros((features,), jnp.float32))
        return _fast_ln(x, scale, bias, float(self.epsilon), cdt.name,
                        self.use_scale, self.use_bias,
                        jnp.dtype(x.dtype).name)


def parse_bn_flag(value):
    """Normalize a config ``batchnorm`` / ``use_bn`` value into
    ``(use_bn, bias_free)``.

    The reference schema uses booleans; this framework additionally
    accepts the string ``"bias_free"`` to select
    :class:`BiasFreeBatchNorm` (no mean subtraction — the CVPR-2020
    paper's actual recipe; docs/INTERPRETABILITY.md measures why the
    boolean mode is only approximately bias-free)."""
    if isinstance(value, str):
        key = value.strip().lower().replace("-", "_")
        if key in ("bias_free", "biasfree"):
            return True, True
        raise ValueError(
            f"unknown batchnorm mode [{value}] — use true/false or "
            f"'bias_free'")
    return bool(value), False


class BiasFreeBatchNorm(nn.Module):
    """Strictly bias-free BatchNorm: normalize by the running *second
    moment* only — ``y = x · rsqrt(E[x²] + ε) · γ`` — no mean
    subtraction, no β.

    The reference's bias-free recipe (``use_bias=False`` convs +
    ``center=False`` BN, reference model.py:268-276) removes β but
    still subtracts the running MEAN at inference — an additive
    constant that breaks exact homogeneity (measured on the shipped
    artifacts: docs/INTERPRETABILITY.md). The CVPR-2020 paper
    (arXiv:1906.05478 §3) removes every additive term. With this
    variant the inference-time map is an exact per-channel linear
    scale, so a ReLU network stays positively homogeneous end to end
    and the net-bias map is identically zero.

    Selected via ``batchnorm: "bias_free"`` in resnet/convnext/unet
    configs. State: ``batch_stats/mean_sq`` (float32);
    params: ``scale``. Under a batch-sharded jit the batch second
    moment reduces over the GLOBAL batch (GSPMD inserts the
    collective), matching ``nn.BatchNorm`` semantics.
    """
    use_running_average: bool = True
    momentum: float = 0.995   # DEFAULT_BN_MOMENTUM (constants.py)
    epsilon: float = 1e-3     # DEFAULT_BN_EPSILON — call sites pass both
    use_scale: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cdt = jnp.dtype(self.dtype or x.dtype)
        features = x.shape[-1]
        ra = self.variable("batch_stats", "mean_sq",
                           lambda: jnp.ones((features,), jnp.float32))
        if self.use_running_average:
            mean_sq = ra.value
        else:
            mean_sq = jnp.mean(jnp.square(x.astype(jnp.float32)),
                               axis=tuple(range(x.ndim - 1)))
            if not self.is_initializing():
                ra.value = (self.momentum * ra.value
                            + (1.0 - self.momentum) * mean_sq)
        scale = (self.param("scale", nn.initializers.ones, (features,),
                            jnp.float32) if self.use_scale
                 else jnp.ones((features,), jnp.float32))
        mult = (scale * jax.lax.rsqrt(mean_sq + self.epsilon)).astype(cdt)
        return x.astype(cdt) * mult
