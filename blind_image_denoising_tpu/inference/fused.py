"""Fused int8 serving path for the flagship unet_laplacian family.

The flagship denoiser runs at ~100% of one chip's HBM bandwidth in bf16
(docs/PERF.md), and int8 through XLA is SLOWER because the dequantized
float tensors get materialized alongside the int8 ones
(docs/QUANTIZATION.md). This module is the producer-side-int8 answer:
the ConvNext residual stages — the dominant byte movers at the two
finest pyramid levels — execute as fused Pallas kernels
(ops/pallas_convnext.py) whose ONLY HBM traffic is int8, while every
float intermediate lives in VMEM. The rest of the forward (stem,
band-splits, up/down-sampling, bottleneck attention, heads) stays XLA
bf16: those tensors are either once-per-image or at coarse resolutions.

This is a param-tree-walking reimplementation of the linen forward for
the exact config family the packaged flagship uses (the same approach as
models/unet_laplacian_v56.py for the imported artifact). ``supports_fused``
guards the config subset; anything else falls back to the standard path.
Equivalence vs ``hydra.apply`` is tested in tests/test_fused.py.

Reference lineage: the fused block math is reference
custom_layers.py:838-1022 (ConvNextBlock) inside
backbone_unet_laplacian.py:318-568; the reference's own deployment-time
quantization was dynamic-range TFLite (export_model.py:143-162) — this
path quantizes activations too, and measures faster, not slower.

Usage::

    fwd, cal_sites = build_fused_forward(config, variables, scales)
    outs = fwd(x_0_255_f32)          # list of per-scale outputs, finest first

    scales = calibrate_fused(config, variables, images)   # amax -> scales
"""

from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..logger import logger
from ..ops.normalize import denormalize, normalize
from ..ops.pallas_convnext import (
    block_weights_from_params,
    from_cf_padded,
    fused_convnext_block,
    quantize_cf,
    to_cf_padded,
)
from ..ops.resize import avg_pool_same, resize_bilinear, upsample_2x_nearest

_DN = ("NHWC", "HWIO", "NHWC")


def supports_fused(backbone_cfg: Dict) -> bool:
    """True when the config is in the fused path's supported subset (the
    packaged flagship family). Every guard mirrors an option the fused
    forward implements exactly one way."""
    c = backbone_cfg
    ok = (
        c.get("type", "").strip().lower() == "unet_laplacian"
        and int(c.get("depth", 5)) >= 2
        and not c.get("use_bn", False)
        and c.get("use_ln", True)
        and not c.get("use_bias", False)
        and c.get("use_gamma", True)
        and not c.get("use_concat", True)       # must be add-skip
        and not c.get("use_mix_project", True)
        and c.get("use_laplacian_averaging", True)
        and not c.get("use_attention_gates", False)
        and not c.get("use_complex_base", False)
        and not c.get("use_global_pool_information", False)
        and c.get("use_output_normalization", False)
        and c.get("activation", "leaky_relu_01") == "leaky_relu_01"
        and c.get("upsample_type") == "upsample_nearest_conv2d"
        and c.get("downsample_type") == "conv2d"
        and int(c.get("encoder_kernel_size", 5)) == 5
        and int(c.get("decoder_kernel_size", 3)) == 5
        and c.get("multiple_scale_outputs", True)
    )
    return bool(ok)


def supports_fused_head(denoiser_cfg: Dict) -> bool:
    """True when the denoiser-head config is in ``_head``'s subset: the
    head math below implements activation in {leaky_relu_01, linear} and
    no BN/LN/bias (the packaged flagship's settings — models/hydra.py:95).
    Anything else must go through the standard hydra path."""
    c = denoiser_cfg
    return bool(
        c.get("activation", "linear") in ("leaky_relu_01", "linear")
        and not c.get("use_bn", False)
        and not c.get("use_ln", False)
        and not c.get("use_bias", False)
    )


def _conv(x, kernel, strides=(1, 1), groups=1, dtype=jnp.bfloat16):
    return lax.conv_general_dilated(
        x.astype(dtype), jnp.asarray(kernel).astype(dtype),
        window_strides=strides, padding="SAME",
        dimension_numbers=_DN, feature_group_count=groups)


def _leaky01(x):
    return jax.nn.leaky_relu(x, 0.1)


def _fast_ln(x, scale, eps=1e-3):
    """FastLayerNorm inference math (layers/norm.py): f32 stats,
    compute-dtype elementwise, scale, no bias."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rsig = lax.rsqrt(var + eps)
    cdt = x.dtype
    y = (x - mean.astype(cdt)) * rsig.astype(cdt)
    return y * jnp.asarray(scale).astype(cdt)


def _gamma_gain(w):
    return jnp.tanh(jnp.maximum(1.0 + jnp.asarray(w, jnp.float32), 0.0))


def _csa(p, x, channels, resolution=(16, 16)):
    """ConvolutionalSelfAttention inference math (layers/attention.py:
    resize to 16x16 -> LN -> qkv 1x1 + leaky_relu(0.3) -> dot-softmax ->
    resize back -> output 1x1 -> gamma)."""
    b, h, w, c = x.shape
    rh, rw = resolution
    y = resize_bilinear(x, (rh, rw))
    y = _fast_ln(y, p["ln"]["scale"])

    def qkv(name):
        v = _conv(y, p[name]["kernel"], dtype=x.dtype)
        v = jax.nn.leaky_relu(v, 0.3)
        return v.reshape(b, rh * rw, channels)

    q, k, v = qkv("query_conv"), qkv("key_conv"), qkv("value_conv")
    scores = jnp.einsum("bqc,bkc->bqk", q, k)
    weights = jax.nn.softmax(scores, axis=-1)
    att = jnp.einsum("bqk,bkc->bqc", weights, v).reshape(b, rh, rw, channels)
    out = resize_bilinear(att, (h, w))
    out = _conv(out, p["output_conv"]["kernel"], dtype=x.dtype)
    return out * _gamma_gain(p["gamma"]["w_multiplier"]).astype(out.dtype)


def _head(p, cfg: Dict, x):
    """DenoiserHead (models/hydra.py): 1x1 + act -> 1x1 -> tanh(2x)*0.51."""
    y = _conv(x, p["conv_0"]["kernel"], dtype=x.dtype)
    if cfg.get("activation", "linear") == "leaky_relu_01":
        y = _leaky01(y)
    y = _conv(y, p["conv_1"]["kernel"], dtype=x.dtype)
    return jnp.tanh(2.0 * y) * jnp.asarray(0.51, y.dtype)


def _stage_sites(levels, width: int) -> List[str]:
    """Calibration-site names: one for each fused stage input and each
    fused block output, per fused level."""
    names = []
    for kind in ("encoder", "decoder"):
        for d in sorted(levels):
            names.append(f"{kind}_{d}_in")
            for w in range(width):
                names.append(f"{kind}_{d}_{w}_out")
    return names


class _AmaxRecorder:
    def __init__(self):
        self.amax: Dict[str, float] = {}

    def record(self, name, x):
        a = float(jnp.abs(x.astype(jnp.float32)).max())
        self.amax[name] = max(a, self.amax.get(name, 0.0))


def build_fused_forward(config: Dict, variables: Dict,
                        scales: Optional[Dict[str, float]] = None,
                        dtype=jnp.bfloat16,
                        interpret: bool = False,
                        fused_levels: Optional[tuple] = None,
                        _recorder: Optional[_AmaxRecorder] = None):
    """Return ``fwd(x) -> [outputs]`` mirroring ``hydra.apply`` for the
    flagship config family, with the ConvNext stages fused.

    ``scales``: site-name -> int8 scale (from :func:`calibrate_fused` or
    the artifact). When None the fused stages run in FLOAT I/O mode —
    byte-equivalent to bf16 storage; correct, but the int8 byte win needs
    scales.
    """
    bcfg = dict(config["backbone"])
    dcfg = dict(config["denoiser"])
    if not supports_fused(bcfg):
        raise ValueError("backbone config outside the fused path's "
                         "supported subset — use the standard hydra path")
    if not supports_fused_head(dcfg):
        raise ValueError("denoiser-head config outside the fused path's "
                         "supported subset (needs leaky_relu_01/linear "
                         "activation, no BN/LN/bias) — use the standard "
                         "hydra path")
    params = variables["params"]
    bb = params["backbone"]
    depth = int(bcfg.get("depth", 5))
    width = max(1, int(bcfg.get("width", 1)))
    gk = int(bcfg.get("gaussian_kernel_size", 3))
    csa_channels = int(bcfg.get("filters", 32))
    use_attention = bool(bcfg.get("use_self_attention", False))
    vr = bcfg.get("value_range", (0, 255))
    v_min, v_max = float(vr[0]), float(vr[1])
    quant = scales is not None

    if fused_levels is None:
        fused_levels = tuple(range(min(2, depth - 1)))

    def fused_stage(x, kind: str, d: int):
        """width x fused ConvNext blocks, int8 (or float) Pallas I/O."""
        B, H, W, C = x.shape
        site_in = f"{kind}_{d}_in"
        if _recorder is not None:
            _recorder.record(site_in, x)
        cf = to_cf_padded(x, pad=2)
        s_prev = None
        if quant:
            s_prev = scales[site_in]
            cf = quantize_cf(cf, s_prev)
        for w in range(width):
            weights = block_weights_from_params(bb[f"{kind}_{d}_{w}"])
            site_out = f"{kind}_{d}_{w}_out"
            s_out = scales[site_out] if quant else 1.0
            cf = fused_convnext_block(
                cf, **weights, H=H, W=W, pad=2,
                scale_in=s_prev if quant else 1.0,
                scale_out=s_out, interpret=interpret)
            if _recorder is not None:
                _recorder.record(
                    site_out,
                    from_cf_padded(cf.astype(jnp.float32), H, W, 2))
            s_prev = s_out
        if quant:
            cf = cf.astype(dtype) * jnp.asarray(s_prev, dtype)
        return from_cf_padded(cf, H, W, 2).astype(dtype)

    def xla_stage(x, kind: str, d: int):
        """Bottleneck (attention) stage — XLA, coarse resolution."""
        for w in range(width):
            if use_attention and d == depth - 1:
                y = _csa(bb[f"{kind}_{d}_{w}_attn"], x, csa_channels)
            else:
                p = bb[f"{kind}_{d}_{w}"]
                wts = block_weights_from_params(p)
                K = int(np.sqrt(wts["dw_w"].shape[1]))
                k_hwio = wts["dw_w"].T.reshape(K, K, 1, x.shape[-1])
                y = _conv(x, k_hwio, groups=x.shape[-1], dtype=x.dtype)
                y = _fast_ln(y, p["conv_1"]["ln"]["scale"])
                y = _leaky01(_conv(y, p["conv_2"]["kernel"], dtype=x.dtype))
                y = _conv(y, p["conv_3"]["kernel"], dtype=x.dtype)
                y = y * _gamma_gain(p["gamma"]["w_multiplier"]).astype(y.dtype)
            x = x + y
        return x

    def fwd(x):
        xn = normalize(x, v_min, v_max)
        v = _leaky01(_conv(xn, bb["stem_conv"]["kernel"], dtype=dtype))

        skips = {}
        for d in range(depth):
            if d in fused_levels:
                v = fused_stage(v, "encoder", d)
            else:
                v = xla_stage(v, "encoder", d)
            v = _fast_ln(v, bb[f"encoder_{d}_out_ln"]["scale"])
            v = _leaky01(v)
            skips[d] = v
            if d != depth - 1:
                smooth = avg_pool_same(v, (gk, gk), (1, 1))
                skips[d] = v - smooth
                v = _leaky01(_conv(smooth, bb[f"down_{d}"]["conv"]["kernel"],
                                   strides=(2, 2), dtype=dtype))

        decoded = {depth - 1: skips[depth - 1]}
        for d in range(depth - 2, -1, -1):
            up = upsample_2x_nearest(decoded[d + 1])
            up = _leaky01(_conv(up, bb[f"up_{d}"]["conv"]["kernel"],
                                dtype=dtype))
            v = skips[d] + up
            if d in fused_levels:
                v = fused_stage(v, "decoder", d)
            else:
                v = xla_stage(v, "decoder", d)
            v = _fast_ln(v, bb[f"decoder_{d}_out_ln"]["scale"])
            decoded[d] = v

        outputs = []
        for i in range(depth):
            y = _head(params[f"denoiser_head_{i}"], dcfg, decoded[i])
            outputs.append(denormalize(y, v_min, v_max))
        return outputs

    return fwd, _stage_sites(fused_levels, width)


def calibrate_fused(config: Dict, variables: Dict, images,
                    margin: float = 1.0,
                    interpret: bool = False) -> Dict[str, float]:
    """Run representative images through the FLOAT fused forward recording
    each stage site's activation amax; return site -> int8 scale.

    ``images``: [N, H, W, C] in the model's value range (include noisy
    samples spanning deployment noise levels — inference/quantize.py has
    the same contract)."""
    rec = _AmaxRecorder()
    fwd, sites = build_fused_forward(config, variables, scales=None,
                                     interpret=interpret, _recorder=rec)
    images = np.asarray(images, np.float32)
    for i in range(images.shape[0]):
        fwd(jnp.asarray(images[i:i + 1]))
    missing = [s for s in sites if s not in rec.amax]
    if missing:
        raise ValueError(f"calibration left sites unrecorded: {missing}")
    scales = {k: max(margin * a, 1e-6) / 127.0 for k, a in rec.amax.items()}
    logger.info(f"fused int8 calibration: {len(scales)} sites")
    return scales
