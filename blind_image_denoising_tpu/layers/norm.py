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
