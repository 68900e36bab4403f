"""Post-training int8 quantization (PTQ) primitives.

Why: the flagship denoiser is HBM-bandwidth-bound on TPU (docs/PERF.md —
80% of v5e bandwidth at 4% of MXU peak), so activation BYTES are the
throughput. int8 halves bytes vs bfloat16 and the v5e MXU runs int8
matmul/conv natively; a micro-benchmark of the flagship's encoder shapes
(1x1 32→128→32 chain @256², honest K-differenced timing) measured int8
2.23x faster than bf16.

Parity note: the reference's deployment artifact is dynamic-range
quantized TFLite — ``Optimize.DEFAULT`` with NO representative dataset
and float I/O (reference export_model.py:143-162), i.e. int8 weights,
float activations. This module goes beyond that: symmetric per-tensor
ACTIVATION scales calibrated on representative images + symmetric
per-output-channel weight scales, executed as int8 lax convolutions with
int32 accumulation.

Mechanics: quantized execution is a TRACE-TIME mode, entered with the
``quant_mode`` context manager around ``model.apply``:

* ``calibrate`` — the normal float path, but every ConvBlock sows the
  absolute max of its input into the mutable ``quant_stats`` collection.
* ``int8`` — ConvBlocks that find an ``in_scale`` in the ``quant``
  collection quantize input + kernel and run the int8 conv; all others
  (and conv-transpose/separable) keep the float path.

The context only matters during tracing; wrap the ``apply`` call itself
(see inference/quantize.py) so jitted closures trace under the mode they
were built for.
"""

import contextlib
import contextvars
import re
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

INT8_MAX = 127.0

_MODE = contextvars.ContextVar("bid_quant_mode", default=None)
_EXCLUDE = contextvars.ContextVar("bid_quant_exclude", default=())
_F32_RESCALE = contextvars.ContextVar("bid_quant_f32_rescale", default=True)


@contextlib.contextmanager
def quant_mode(mode: Optional[str], exclude: Sequence[str] = (),
               f32_rescale: bool = True):
    """Enter a quantization mode: None, 'calibrate' or 'int8'.

    ``exclude``: regexes matched against the flax module path
    ('/'-joined); matching ConvBlocks keep the float path (e.g. the
    denoiser heads' final convs if a quality study demands it).

    ``f32_rescale``: dequantize the int32 accumulator through float32
    (exact) vs directly in the compute dtype (bf16: no f32 intermediate
    tensor, ~0.4% relative rounding on the accumulator).
    """
    if mode not in (None, "calibrate", "int8"):
        raise ValueError(f"unknown quant mode [{mode}]")
    t1 = _MODE.set(mode)
    t2 = _EXCLUDE.set(tuple(exclude))
    t3 = _F32_RESCALE.set(bool(f32_rescale))
    try:
        yield
    finally:
        _MODE.reset(t1)
        _EXCLUDE.reset(t2)
        _F32_RESCALE.reset(t3)


def current_quant_mode(module_path: Tuple[str, ...] = ()) -> Optional[str]:
    """The active mode for a module at ``module_path`` (None if excluded)."""
    mode = _MODE.get()
    if mode is None:
        return None
    path = "/".join(module_path)
    for pattern in _EXCLUDE.get():
        if re.search(pattern, path):
            return None
    return mode


def amax(x: jnp.ndarray) -> jnp.ndarray:
    """Scalar absolute maximum, f32."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)))


def quantize(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric int8 quantization: round(x/scale) clipped to ±127."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -INT8_MAX, INT8_MAX).astype(jnp.int8)


def weight_scales(kernel: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Per-output-channel symmetric scales for an HWIO kernel (the output
    channel is the trailing dim for regular, grouped AND depthwise lax
    convolutions)."""
    k = kernel.astype(jnp.float32)
    a = jnp.max(jnp.abs(k), axis=tuple(range(k.ndim - 1)))
    return jnp.maximum(a, eps) / INT8_MAX


def int8_conv(x8: jnp.ndarray, k8: jnp.ndarray,
              strides, padding, feature_group_count: int = 1) -> jnp.ndarray:
    """int8 x int8 -> int32 convolution (MXU-native on TPU)."""
    return lax.conv_general_dilated(
        x8, k8, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32)


def conv2d(module, site: str, x: jnp.ndarray, kernel: jnp.ndarray, *,
           strides=(1, 1), padding="SAME", groups: int = 1,
           compute_dtype=None) -> jnp.ndarray:
    """NHWC/HWIO convolution with the PTQ hooks, callable from any flax
    module (layers/conv.py ConvBlock and the pretrained v5.6
    reconstruction both route through here).

    * no mode: plain float conv in ``compute_dtype``.
    * 'calibrate': float conv + sow ``{site}_amax`` of the input into the
      mutable ``quant_stats`` collection.
    * 'int8' (and a calibrated ``{site}_scale`` exists in the ``quant``
      collection): quantize input per-tensor + kernel per-output-channel,
      convolve int8 with int32 accumulation, rescale.

    Distinct conv sites in one module use distinct ``site`` names; convs
    consuming the SAME tensor may share a site (one scale).
    """
    compute_dtype = compute_dtype or x.dtype
    mode = current_quant_mode(module.path)
    if mode == "calibrate":
        module.sow("quant_stats", f"{site}_amax", amax(x),
                   init_fn=lambda: jnp.zeros((), jnp.float32),
                   reduce_fn=jnp.maximum)
    if mode == "int8" and module.has_variable("quant", f"{site}_scale"):
        s_in = module.get_variable("quant", f"{site}_scale")
        x8 = quantize(x, s_in)
        s_w = weight_scales(kernel)
        k8 = quantize(kernel, s_w)
        y32 = int8_conv(x8, k8, strides, padding,
                        feature_group_count=groups)
        if _F32_RESCALE.get():
            return (y32.astype(jnp.float32) *
                    (s_in * s_w)).astype(compute_dtype)
        # rescale directly in the compute dtype: the f32 accumulator
        # tensor never materializes (the scale vector is tiny)
        return y32.astype(compute_dtype) * \
            (s_in * s_w).astype(compute_dtype)
    return lax.conv_general_dilated(
        x.astype(compute_dtype), kernel.astype(compute_dtype),
        window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
