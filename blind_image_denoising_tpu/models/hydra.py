"""Hydra model assembly: normalizer → backbone → per-scale denoiser heads →
denormalizer.

Equivalent of reference model.py:58-433. The hydra takes a float32 image in
[v0, v1] (usually [0, 255]) and returns one denoised image per backbone
output scale, finest first, in [v0, v1].

Documented deviation from the reference: the reference does NOT denormalize
single-output hydras — the head output stays in [-0.51, 0.51] while the
training loss compares it against [0, 255] ground truth
(reference model.py:110-116 + train_loop.py:276-286), which makes
single-head configs untrainable there. Here every head is denormalized,
single- or multi-output, so resnet/unet/convnext configs train correctly.
"""

from collections import namedtuple
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import input_shape_fixer
from ..layers.conv import ConvBlock
from ..layers.norm import parse_bn_flag
from ..logger import logger
from ..ops.normalize import normalize, denormalize
from . import resnet as _resnet_mod
from . import unet as _unet_mod
from . import unet_laplacian as _unet_laplacian_mod
from .resnet import ResnetBackbone, ConvNextBackbone
from .segnet import SegnetBackbone
from .unet import UnetBackbone
from .unet_laplacian import UnetLaplacianBackbone


BuilderResults = namedtuple(
    "BuilderResults",
    ["backbone", "normalizer", "denormalizer", "denoiser", "hydra", "options"])


_BACKBONES = {
    "resnet": ResnetBackbone,
    "unet": UnetBackbone,
    "unet_laplacian": UnetLaplacianBackbone,
    "convnext": ConvNextBackbone,
    "segnet": SegnetBackbone,
}

_BACKBONE_KEYS = {
    "resnet": _resnet_mod.KNOWN_KEYS,
    "convnext": _resnet_mod.KNOWN_KEYS,
    "unet": _unet_mod.KNOWN_KEYS,
    "unet_laplacian": _unet_laplacian_mod.KNOWN_KEYS,
}

# options the reference's own snapshot parses but never applies (their
# use_* flag is assigned and nothing reads it) — accepted with a warning
_REFERENCE_NOOP_KEYS = frozenset({
    "add_gradient_dropout",  # reference backbone_blocks.py:130
})


# backbone_from_config runs inside the traced Hydra body (once per XLA
# retrace: serving warms several shape buckets) AND eagerly in model_builder;
# dedupe so each misconfigured key warns once per process, not once per trace
_WARNED_KEYS = set()


def _warn_unknown_keys(config: Dict, model_type: str) -> None:
    """Warn on config keys the builder does not understand, instead of
    silently building a different model (the VERDICT-r1 failure mode for
    add_mean_sigma_normalization)."""
    known = _BACKBONE_KEYS.get(model_type)
    if known is None:
        return
    for k in sorted(config):
        if k in known:
            continue
        if (model_type, k) in _WARNED_KEYS:
            continue
        _WARNED_KEYS.add((model_type, k))
        if k in _REFERENCE_NOOP_KEYS:
            logger.warning(
                f"backbone [{model_type}]: '{k}' accepted but a NO-OP "
                f"(the reference snapshot also never applies it)")
        else:
            logger.warning(
                f"backbone [{model_type}]: unrecognized config key "
                f"'{k}' is IGNORED")


def backbone_from_config(config: Dict, dtype: Any = None) -> nn.Module:
    """Dispatch a backbone config to its module
    (reference model.py:204-216)."""
    model_type = config["type"].strip().lower()
    if model_type == "efficientnet":
        raise NotImplementedError("efficientnet not implemented")
    if model_type not in _BACKBONES:
        raise ValueError(f"don't know how to build backbone [{model_type}]")
    _warn_unknown_keys(config, model_type)
    return _BACKBONES[model_type](config=config, dtype=dtype, name="backbone")


class DenoiserHead(nn.Module):
    """Per-scale denoiser head: 1×1 conv (+BN/LN) → 1×1 conv →
    tanh(2x)·0.51 squash keeping outputs in ≈[-0.51, 0.51] normalized range
    (reference model.py:251-359)."""
    config: Dict[str, Any]
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = dict(self.config)
        use_bias = cfg.get("use_bias", False)
        head_use_bn, head_bn_bias_free = parse_bn_flag(
            cfg.get("use_bn", False))
        x = ConvBlock(
            features=cfg.get("filters", 32), kernel_size=1,
            use_bias=use_bias,
            activation=cfg.get("activation", "linear"),
            kernel_regularizer=cfg.get("kernel_regularizer", "l2"),
            kernel_initializer=cfg.get("kernel_initializer", "glorot_normal"),
            use_bn=head_use_bn,
            use_ln=cfg.get("use_ln", False),
            bn_center=use_bias,
            bn_bias_free=head_bn_bias_free,
            dtype=self.dtype, name="conv_0")(x, train=train)
        x = ConvBlock(
            features=cfg.get("output_channels", 3), kernel_size=1,
            use_bias=use_bias, activation="linear",
            kernel_regularizer=cfg.get("kernel_regularizer", "l2"),
            kernel_initializer=cfg.get("kernel_initializer", "glorot_normal"),
            dtype=self.dtype, name="conv_1")(x, train=train)
        return jnp.tanh(2.0 * x) * 0.51


class Hydra(nn.Module):
    """Full denoising model (reference model.py:58-162)."""
    config: Dict[str, Any]       # {"backbone": {...}, "denoiser": {...}}
    dtype: Any = None

    @property
    def value_range(self):
        vr = self.config["backbone"].get("value_range", (0, 255))
        return float(vr[0]), float(vr[1])

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        v_min, v_max = self.value_range
        xn = normalize(x, v_min, v_max)

        feats = backbone_from_config(
            self.config["backbone"], dtype=self.dtype)(xn, train=train)

        denoiser_cfg = self.config["denoiser"]
        outputs = []
        for i, f in enumerate(feats):
            y = DenoiserHead(denoiser_cfg, dtype=self.dtype,
                             name=f"denoiser_head_{i}")(f, train=train)
            outputs.append(denormalize(y, v_min, v_max))
        return outputs


def model_builder(config: Dict, dtype: Any = None) -> BuilderResults:
    """Build the hydra and its sub-model handles from a ``model`` config
    (reference model.py:58-162 returns the same named fields)."""
    backbone_cfg = dict(config["backbone"])
    backbone_cfg["input_shape"] = input_shape_fixer(
        backbone_cfg.get("input_shape", ["?", "?", 3]))
    cfg = {"backbone": backbone_cfg, "denoiser": dict(config["denoiser"])}

    hydra = Hydra(config=cfg, dtype=dtype)
    v_min, v_max = hydra.value_range

    return BuilderResults(
        backbone=backbone_from_config(backbone_cfg, dtype=dtype),
        normalizer=lambda x: normalize(x, v_min, v_max),
        denormalizer=lambda x: denormalize(x, v_min, v_max),
        denoiser=DenoiserHead(cfg["denoiser"], dtype=dtype),
        hydra=hydra,
        options={},
    )
