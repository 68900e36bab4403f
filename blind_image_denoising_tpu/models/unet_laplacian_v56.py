"""Native reconstruction of the shipped pretrained ``unet_laplacian_v5.6``.

The pretrained artifact predates the reference snapshot's code: its traced
graph (decoded op-by-op from
reference bfcnn/pretrained/unet_laplacian_v5.6/denoiser_model.tflite)
differs from what backbone_unet_laplacian.py:35-615 would build today:

* ConvNext-block expansions use GELU (snapshot: config activation),
* bottleneck self-attention runs at FULL resolution with GELU q/k/v and a
  SECOND LayerNorm on the attention output (snapshot: 16×16-pinned, one LN),
* the Laplacian smoothing is a fixed 3×3 Gaussian depthwise filter,
* downsample = strided slice + 1×1 conv + leaky_relu(0.1),
* upsample = linear 1×1 conv then bilinear resize (commuted laplacian path),
* no per-stage output normalization in the encoder/decoder; a single
  LayerNorm sits before each denoiser head,
* heads: 1×1 conv (leaky_relu 0.1) → 1×1 conv → tanh(2x)·0.51 → denormalize.

This module reproduces that computation with the ORIGINAL float32 weights
from model_hydra.keras (the TFLite's weights are int8 dynamic-range
quantized), imported by inference/import_v56.py. Parity vs the TFLite-graph
executor is asserted in tests (within weight-quantization tolerance).
"""

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import quant as quant_ops
from ..ops.gaussian import gaussian_blur
from ..ops.normalize import denormalize, normalize
from ..ops.resize import upsample_2x_bilinear


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.1)


def _conv(x, kernel, groups=1):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def _qconv(module, site, x, kernel, groups=1):
    """Convolution with int8 PTQ hooks (ops/quant.py conv2d): float by
    default; records/uses the site's activation scale under
    quant_mode('calibrate'/'int8'). Compute dtype follows the module's
    ``dtype`` attribute (bfloat16 when serving with dtype="bfloat16";
    float32 default) — params stay float32 either way."""
    return quant_ops.conv2d(module, site, x, kernel, groups=groups,
                            compute_dtype=getattr(module, "dtype", None)
                            or jnp.float32)


class _LN(nn.Module):
    """LayerNorm over channels, scale-only (center=False), eps 1e-3.
    Statistics in the input dtype; the f32 scale param is cast to it so
    a bfloat16 activation path stays bfloat16 (f32 promotion would
    silently undo the reduced-precision compute downstream)."""
    features: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones_init(),
                           (self.features,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-3) * gamma.astype(x.dtype)


class _Gamma(nn.Module):
    """ChannelLearnableMultiplier inference form: tanh(relu(1+w))·x."""
    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("w", nn.initializers.zeros_init(), (self.features,))
        return x * jnp.tanh(jnp.maximum(1.0 + w, 0.0)).astype(x.dtype)


class _ConvNextV56(nn.Module):
    """dw k×k (linear) → LN → 1×1 expand (GELU) → 1×1 project → gamma."""
    features: int
    dw_kernel: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c, k = self.features, self.dw_kernel
        dw = self.param("conv_1", nn.initializers.glorot_normal(),
                        (k, k, 1, c))
        y = _qconv(self, "dw", x, dw, groups=c)
        y = _LN(c, name="ln")(y)
        w2 = self.param("conv_2", nn.initializers.glorot_normal(),
                        (1, 1, c, 4 * c))
        y = jax.nn.gelu(_qconv(self, "expand", y, w2), approximate=False)
        w3 = self.param("conv_3", nn.initializers.glorot_normal(),
                        (1, 1, 4 * c, c))
        y = _qconv(self, "project", y, w3)
        return _Gamma(c, name="gamma")(y)


class _AttentionV56(nn.Module):
    """Full-resolution self-attention: LN → GELU q/k/v 1×1 convs →
    softmax(q kᵀ) v → LN → 1×1 output conv → gamma."""
    channels: int          # input channels (128)
    attention_channels: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ca = self.attention_channels
        y = _LN(c, name="ln_0")(x)

        def qkv(name):
            k = self.param(name, nn.initializers.glorot_normal(),
                           (1, 1, c, ca))
            # the three projections consume the same tensor -> shared site
            return jax.nn.gelu(_qconv(self, "qkv", y, k),
                               approximate=False).reshape(b, h * w, ca)

        q = qkv("query_conv")
        k = qkv("key_conv")
        v = qkv("value_conv")
        # Quirk preserved from the saved artifact: the v5.6-era code passed
        # [q, k, v] to keras.layers.Attention, whose positional contract is
        # [query, VALUE, KEY] — so scores pair query with value_conv and
        # the mixing matrix is key_conv (verified by weight correlation
        # against the traced graph).
        scores = jnp.einsum("bqc,bkc->bqk", q, v)
        a = jnp.einsum("bqk,bkc->bqc", jax.nn.softmax(scores, axis=-1), k)
        a = a.reshape(b, h, w, ca)
        a = _LN(ca, name="ln_1")(a)
        wo = self.param("output_fn", nn.initializers.glorot_normal(),
                        (1, 1, ca, c))
        return _Gamma(c, name="gamma")(_qconv(self, "out", a, wo))


class UnetLaplacianV56(nn.Module):
    """The full pretrained hydra: normalize → backbone → LN → head →
    denormalize. Returns the finest-scale output only (matching the traced
    artifact); ``all_scales=True`` returns all three heads."""
    filters: int = 32
    width: int = 3
    dtype: Any = None   # compute dtype (e.g. jnp.bfloat16); params stay f32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 all_scales: bool = False,
                 train: bool = False):   # inference-only; accepted for the
                 # standard hydra calling convention (Denoiser, eval steps)
        f = self.filters
        xn = normalize(x, 0.0, 255.0)

        stem = self.param("stem", nn.initializers.glorot_normal(),
                          (5, 5, 3, f))
        h = _leaky(_qconv(self, "stem", xn, stem))

        skips: Dict[int, jnp.ndarray] = {}
        channels = {0: f, 1: 2 * f, 2: 4 * f}

        # --- encoder d=0,1: width× residual ConvNext(k5), gaussian band
        # split, strided downsample + 1×1 conv + leaky
        for d in (0, 1):
            c = channels[d]
            for wdt in range(self.width):
                h = h + _ConvNextV56(c, 5, dtype=self.dtype, name=f"enc_{d}_{wdt}")(h)
            smooth = gaussian_blur(h, kernel_size=(3, 3))
            skips[d] = h - smooth
            down_k = self.param(f"down_{d}", nn.initializers.glorot_normal(),
                                (1, 1, c, channels[d + 1]))
            h = _leaky(_qconv(self, f"down_{d}", smooth[:, ::2, ::2, :],
                              down_k))

        # --- bottleneck: width× residual full-res attention
        for wdt in range(self.width):
            h = h + _AttentionV56(channels[2], dtype=self.dtype, name=f"attn_{wdt}")(h)
        skips[2] = h

        # --- decoder d=1,0: linear 1×1 conv → bilinear 2×, add band skip,
        # width× residual ConvNext(k1)
        decoded = {2: h}
        for d in (1, 0):
            c = channels[d]
            up_k = self.param(f"up_{d}", nn.initializers.glorot_normal(),
                              (1, 1, channels[d + 1], c))
            v = upsample_2x_bilinear(
                _qconv(self, f"up_{d}", decoded[d + 1], up_k)) + skips[d]
            for wdt in range(self.width):
                v = v + _ConvNextV56(c, 1, dtype=self.dtype, name=f"dec_{d}_{wdt}")(v)
            decoded[d] = v

        # --- heads: LN → 1×1 (leaky) → 1×1 → tanh(2x)·0.51 → denormalize
        def head(z, c, idx):
            z = _LN(c, name=f"out_ln_{idx}")(z)
            w0 = self.param(f"head_{idx}_conv_0",
                            nn.initializers.glorot_normal(), (1, 1, c, f))
            z = _leaky(_qconv(self, f"head_{idx}_0", z, w0))
            w1 = self.param(f"head_{idx}_conv_1",
                            nn.initializers.glorot_normal(), (1, 1, f, 3))
            z = jnp.tanh(2.0 * _qconv(self, f"head_{idx}_1", z, w1)) * 0.51
            return denormalize(z, 0.0, 255.0)

        if not all_scales:
            return [head(decoded[0], channels[0], 0)]
        return [head(decoded[d], channels[d], d) for d in (0, 1, 2)]
