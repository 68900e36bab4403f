"""U-Net Laplacian backbone — the flagship model family.

Equivalent of reference backbone_unet_laplacian.py:35-615: a ConvNext-block
U-Net where the skip at each level carries the Laplacian band
``x − smooth(x)`` while the downsample path continues from ``smooth(x)``
(backbone_unet_laplacian.py:366-389). Optional fixed-resolution
self-attention at the bottleneck, additive attention gates on skips,
global-pool FiLM modulation, stochastic depth, multi-scale outputs
finest-first.

TPU design notes:
* The reference resolves the decoder with a dataflow worklist over a
  (depth, 0/1) node grid (backbone_unet_laplacian.py:437-568). The
  dependency structure is statically a chain — node (d,1) depends on
  (d,0) and (d+1,1) — so here the decoder is a plain reversed loop; the
  whole network traces to one static XLA graph.
* The Laplacian band-split is an avg-pool + subtract, fused by XLA into
  the surrounding convs. A Pallas kernel alternative exists
  (ops/pallas_pyramid.laplacian_band_smooth, custom-VJP, wired via the
  backbone's use_pallas_pyramid key) but defaults OFF: honest
  K-differenced on-TPU timing measured it 8-11% slower end-to-end than
  the XLA fusion — see ops/pallas_pyramid.py.
* Every scale's output is a separate array so the multi-head hydra and
  per-scale deep supervision shard naturally over a data-parallel mesh.
"""

from typing import Any, Dict, List

import numpy as np
import flax.linen as nn
import jax.numpy as jnp

from ..constants import DEFAULT_BN_EPSILON, DEFAULT_BN_MOMENTUM, DEFAULT_LN_EPSILON
from ..layers.activations import Activation
from ..layers.attention import AdditiveAttentionGate, ConvolutionalSelfAttention
from ..layers.conv import conv_block_from_params
from ..layers.convnext import ConvNextBlock
from ..layers.misc import GaussianFilter
from ..layers.multipliers import ChannelLearnableMultiplier
from ..layers.norm import FastLayerNorm
from ..layers.sampling import Downsample, Upsample
from ..layers.stochastic import StochasticDepth
from ..ops.pallas_pyramid import laplacian_band_smooth, on_tpu
from ..ops.resize import avg_pool_same, depth_to_space, space_to_depth


class UnetLaplacianBackbone(nn.Module):
    config: Dict[str, Any]
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        cfg = dict(self.config)
        depth = int(cfg.get("depth", 5))
        if depth <= 0:
            raise ValueError("depth must be > 0")

        def per_level(val, name, lo=1):
            """int -> uniform across levels; list -> one entry per level.

            TPU extension over the reference's scalar knobs
            (backbone_unet_laplacian.py:62-77): the full-resolution level
            dominates both HBM bytes and VPU elementwise work (docs/PERF.md
            roofline), so per-level width/tap counts let a config spend
            capacity at the cheap coarse levels and stay lean at level 0."""
            if isinstance(val, (list, tuple)):
                if len(val) != depth:
                    raise ValueError(
                        f"{name} must be an int or a list with one entry per "
                        f"level ({depth}), got {len(val)} entries")
                vals = [int(v) for v in val]
            else:
                vals = [int(val)] * depth
            if any(v < lo for v in vals):
                raise ValueError(f"{name} entries must be >= {lo}")
            return vals

        widths = per_level(cfg.get("width", 1), "width")

        filters = int(cfg.get("filters", 32))
        max_filters = int(cfg.get("max_filters", -1))
        mult = float(cfg.get("filters_level_multiplier", 2.0))
        activation = cfg.get("activation", "leaky_relu_01")
        encoder_kernels = per_level(
            cfg.get("encoder_kernel_size", 5), "encoder_kernel_size")
        decoder_kernels = per_level(
            cfg.get("decoder_kernel_size", 3), "decoder_kernel_size")
        gaussian_kernel = int(cfg.get("gaussian_kernel_size", 3))
        upsample_type = cfg.get("upsample_type", "bilinear")
        downsample_type = cfg.get("downsample_type", "strides")
        use_bn = cfg.get("use_bn", False)
        if isinstance(use_bn, str):
            raise ValueError(
                "unet_laplacian does not support string batchnorm modes "
                "('bias_free' is resnet/convnext/unet-family only; this "
                "family is LayerNorm-based)")
        use_ln = cfg.get("use_ln", True)
        use_bias = cfg.get("use_bias", False)
        use_gamma = cfg.get("use_gamma", True)
        use_concat = cfg.get("use_concat", True)
        use_laplacian = cfg.get("use_laplacian", True)
        use_laplacian_averaging = cfg.get("use_laplacian_averaging", True)
        use_mix_project = cfg.get("use_mix_project", True)
        use_self_attention = cfg.get("use_self_attention", False)
        use_attention_gates = cfg.get("use_attention_gates", False)
        use_complex_base = cfg.get("use_complex_base", False)
        use_global_pool = cfg.get("use_global_pool_information", False)
        use_out_norm = cfg.get("use_output_normalization", False)
        soft_orthogonal = cfg.get("use_soft_orthogonal_regularization", False)
        soft_orthonormal = cfg.get("use_soft_orthonormal_regularization", False)
        kernel_regularizer = cfg.get("kernel_regularizer", "l2")
        kernel_initializer = cfg.get("kernel_initializer", "glorot_normal")
        dropout_rate = max(0.0, cfg.get("dropout_rate", -1.0))
        spatial_dropout_rate = max(0.0, cfg.get("spatial_dropout_rate", -1.0))
        depth_drop_rate = float(cfg.get("depth_drop_rate", 0.0))
        csa_dropout = float(cfg.get(
            "convolutional_self_attention_dropout_rate", 0.0))
        multiple_scale_outputs = cfg.get("multiple_scale_outputs", True)
        # Fused Pallas band-split kernel: "auto" → on when on a TPU
        # backend; default OFF — honest K-differenced timing (device_get
        # forced; the tunnel's block_until_ready returns early) measured
        # the kernel 8-11% SLOWER end-to-end than XLA's own fusion of
        # pool+subtract into the surrounding convs, because band+smooth
        # both round-trip HBM where XLA fuses the subtract into consumers.
        # Kept as an option for reuse in memory-bound compositions.
        pallas_pyramid = cfg.get("use_pallas_pyramid", False)
        use_pallas = (on_tpu() if pallas_pyramid == "auto"
                      else bool(pallas_pyramid))
        if soft_orthogonal and soft_orthonormal:
            raise ValueError("soft orthogonal and orthonormal regularization "
                             "are mutually exclusive")
        if not 0.0 <= csa_dropout <= 1.0:
            raise ValueError("convolutional_self_attention_dropout_rate must "
                             "be within [0, 1]")

        # plain Python floats: a numpy-scalar rate makes flax Dropout's
        # keep_prob strong-typed, promoting bf16 activations to f32 and
        # crashing lax.select under bfloat16 compute
        depth_drop_rates = [
            [float(r)
             for r in np.linspace(0.0, max(0.0, depth_drop_rate), widths[d])]
            for d in range(depth)]

        # --- per-depth conv parameter tables
        def level_filters(d: int) -> int:
            f = int(round(filters * max(1.0, mult ** d)))
            return min(max_filters, f) if max_filters > 0 else f

        common = dict(strides=(1, 1), padding="same", use_bias=use_bias,
                      kernel_regularizer=kernel_regularizer,
                      kernel_initializer=kernel_initializer)
        res_1, res_2, res_3, down_p, up_p = [], [], [], [], []
        for d in range(depth):
            f, f_next = level_filters(d), level_filters(d + 1)
            res_1.append(dict(kernel_size=encoder_kernels[d],
                              depth_multiplier=1,
                              activation="linear", **common))
            res_2.append(dict(kernel_size=1, filters=f * 4,
                              activation=activation, **common))
            res_3.append(dict(kernel_size=1, filters=f,
                              activation="linear", **common))
            down_p.append(dict(kernel_size=encoder_kernels[d], filters=f_next,
                               activation=activation, **common))
            up_p.append(dict(kernel_size=encoder_kernels[d], filters=f,
                             activation=activation, **common))

        def convnext(name, d, kernel_override=None):
            p1 = dict(res_1[d])
            if kernel_override is not None:
                p1["kernel_size"] = kernel_override
            return ConvNextBlock(
                conv_params_1=p1, conv_params_2=res_2[d], conv_params_3=res_3[d],
                use_bn=use_bn, use_ln=use_ln, bn_center=use_bias,
                use_gamma=use_gamma,
                dropout_rate=dropout_rate,
                spatial_dropout_rate=spatial_dropout_rate,
                use_soft_orthogonal_regularization=soft_orthogonal,
                use_soft_orthonormal_regularization=soft_orthonormal,
                dtype=self.dtype, name=name)

        def output_norm(v, name):
            if use_bn:
                v = nn.BatchNorm(use_running_average=not train,
                                 momentum=DEFAULT_BN_MOMENTUM,
                                 epsilon=DEFAULT_BN_EPSILON,
                                 use_bias=use_bias, dtype=self.dtype,
                                 name=f"{name}_bn")(v)
            if use_ln:
                v = FastLayerNorm(epsilon=DEFAULT_LN_EPSILON,
                                  use_bias=use_bias,
                                  dtype=self.dtype, name=f"{name}_ln")(v)
            return v

        def residual_stage(v, d, name_prefix, kernel_override=None,
                           allow_attention=False):
            """width× (ConvNext block [+ stochastic depth] + skip add)."""
            for w in range(widths[d]):
                v_skip = v
                if allow_attention and use_self_attention and d == depth - 1:
                    v = ConvolutionalSelfAttention(
                        attention_channels=filters,
                        use_bn=use_bn, use_ln=use_ln, bn_center=use_bias,
                        use_gamma=True,
                        attention_activation="leaky_relu",
                        output_activation="linear",
                        use_soft_orthonormal_regularization=True,
                        dropout_rate=csa_dropout,
                        dtype=self.dtype,
                        name=f"{name_prefix}_{w}_attn")(v, train=train)
                else:
                    v = convnext(f"{name_prefix}_{w}", d,
                                 kernel_override)(v, train=train)
                if v_skip.shape[-1] == v.shape[-1]:
                    if depth_drop_rates[d][w] > 0.0:
                        v = StochasticDepth(
                            depth_drop_rates[d][w],
                            name=f"{name_prefix}_{w}_droppath")(v, train=train)
                    v = v_skip + v
            return v

        # --- optional space-to-depth stem (MXU-oriented TPU extension,
        # VERDICT r3 #3): pixel-unshuffle the input r×r so the dominant
        # full-resolution level runs at H/r × W/r with r²·C_in channels —
        # same pixel count, r²× the arithmetic intensity per conv row,
        # fewer HBM-bound rows (docs/PERF.md roofline: this family is
        # bandwidth-bound at C=32). Every scale output is pixel-shuffled
        # back so the backbone's external scale contract (finest at H,
        # scale k at H/2^k) is unchanged.
        s2d = int(cfg.get("space_to_depth_stem", 0) or 0)
        if s2d == 1:
            raise ValueError("space_to_depth_stem must be 0 (off) or >= 2")
        if s2d > 1:
            x = space_to_depth(x, s2d)

        # --- base stem (reference backbone_unet_laplacian.py:276-316)
        if use_complex_base:
            x = conv_block_from_params(
                dict(common, kernel_size=(5, 5), filters=max(filters, 96),
                     activation="linear"),
                "stem_conv_0", dtype=self.dtype)(x, train=train)
            x = conv_block_from_params(
                dict(common, kernel_size=(1, 1), filters=filters,
                     activation=activation),
                "stem_conv_1", dtype=self.dtype)(x, train=train)
        else:
            x = conv_block_from_params(
                dict(common, kernel_size=(5, 5), filters=filters,
                     activation=activation),
                "stem_conv", dtype=self.dtype)(x, train=train)

        # --- encoder with Laplacian band-split between levels
        skips: Dict[int, jnp.ndarray] = {}
        for d in range(depth):
            x = residual_stage(x, d, f"encoder_{d}", allow_attention=True)
            if use_out_norm:
                x = output_norm(x, f"encoder_{d}_out")
            x = Activation(activation, name=f"encoder_{d}_act")(x)

            skips[d] = x
            if d != depth - 1:
                if use_laplacian or use_laplacian_averaging:
                    if use_laplacian_averaging:
                        if use_pallas:
                            # fused Mosaic kernel: pool + subtract in one
                            # VMEM pass; custom-VJP so the train step
                            # differentiates through it (ops/pallas_pyramid.py)
                            band, smooth = laplacian_band_smooth(
                                x, gaussian_kernel)
                        else:
                            smooth = avg_pool_same(
                                x, (gaussian_kernel, gaussian_kernel), (1, 1))
                            band = x - smooth
                    else:
                        smooth = GaussianFilter(
                            kernel_size=(gaussian_kernel, gaussian_kernel),
                            name=f"encoder_{d}_gauss")(x)
                        band = x - smooth
                    skips[d] = band         # high-frequency band → skip
                    x = smooth              # low-frequency band → down
                x = Downsample(downsample_type, down_p[d], dtype=self.dtype,
                               name=f"down_{d}")(x, train=train)

        # --- optional global-pool FiLM modulation of all higher skips
        # (reference backbone_unet_laplacian.py:391-431)
        if use_global_pool:
            bottom = conv_block_from_params(
                dict(res_3[depth - 1], kernel_size=(1, 1),
                     activation=activation),
                "gpool_conv", dtype=self.dtype)(skips[depth - 1], train=train)
            pooled = jnp.mean(bottom, axis=(1, 2), keepdims=True)
            pooled = output_norm(pooled, "gpool")
            for d in range(depth - 1):
                gain = conv_block_from_params(
                    dict(res_3[d], kernel_size=(1, 1), activation="linear"),
                    f"gpool_proj_{d}", dtype=self.dtype)(pooled, train=train)
                gain = ChannelLearnableMultiplier(
                    name=f"gpool_scale_{d}")(gain)
                skips[d] = skips[d] * gain

        # --- decoder: statically-unrolled chain, deepest → finest
        decoded: Dict[int, jnp.ndarray] = {depth - 1: skips[depth - 1]}
        for d in range(depth - 2, -1, -1):
            x_same = skips[d]
            x_up = Upsample(upsample_type, up_p[d], dtype=self.dtype,
                            name=f"up_{d}")(decoded[d + 1], train=train)

            if use_attention_gates:
                x_same = AdditiveAttentionGate(
                    attention_channels=res_3[d]["filters"],
                    use_bias=use_bias, use_bn=use_bn, use_ln=use_ln,
                    use_soft_orthogonal_regularization=soft_orthogonal,
                    use_soft_orthonormal_regularization=soft_orthonormal,
                    kernel_initializer=kernel_initializer,
                    dtype=self.dtype,
                    name=f"gate_{d}")(x_same, x_up, train=train)

            if use_concat:
                v = jnp.concatenate([x_same, x_up], axis=-1)
            else:
                v = x_same + x_up
            if use_mix_project:
                v = conv_block_from_params(
                    dict(res_3[d], kernel_size=(1, 1), activation=activation),
                    f"mix_{d}", dtype=self.dtype)(v, train=train)

            v = residual_stage(v, d, f"decoder_{d}",
                               kernel_override=decoder_kernels[d])
            if use_out_norm:
                v = output_norm(v, f"decoder_{d}_out")
            # NOTE: no post-norm activation on decoder nodes (reference
            # leaves it commented out, backbone_unet_laplacian.py:565-566)
            decoded[d] = v

        # --- multi-scale outputs, finest first
        # (reference backbone_unet_laplacian.py:570-608)
        outs = ([decoded[d] for d in range(depth)]
                if multiple_scale_outputs else [decoded[0]])
        if s2d > 1:
            for o in outs:
                if o.shape[-1] % (s2d * s2d):
                    raise ValueError(
                        f"space_to_depth_stem={s2d} needs every level's "
                        f"filters divisible by {s2d * s2d} to pixel-"
                        f"shuffle back (got C={o.shape[-1]}); raise "
                        f"'filters'")
            outs = [depth_to_space(o, s2d) for o in outs]
        return outs


KNOWN_KEYS = frozenset({
    "type", "input_shape", "value_range",
    "depth", "width", "filters", "max_filters", "filters_level_multiplier",
    "activation", "encoder_kernel_size", "decoder_kernel_size",
    "gaussian_kernel_size", "upsample_type", "downsample_type",
    "use_bn", "use_ln", "use_bias", "use_gamma", "use_concat",
    "use_laplacian", "use_laplacian_averaging", "use_mix_project",
    "use_self_attention", "use_attention_gates", "use_complex_base",
    "use_global_pool_information", "use_output_normalization",
    "use_soft_orthogonal_regularization",
    "use_soft_orthonormal_regularization",
    "kernel_regularizer", "kernel_initializer",
    "dropout_rate", "spatial_dropout_rate", "depth_drop_rate",
    "convolutional_self_attention_dropout_rate",
    "multiple_scale_outputs", "use_pallas_pyramid", "space_to_depth_stem",
})
