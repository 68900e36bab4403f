"""The universal convolution block (conv → BN → LN → activation → dropout).

TPU-native equivalent of the reference's ``conv2d_wrapper``
(/root/reference/bfcnn/utilities.py:132-224) and ``dense_wrapper``. One
linen module covers Conv2D / DepthwiseConv2D / Conv2DTranspose /
SeparableConv2D / grouped conv. Everything is NHWC/HWIO so XLA tiles the
convolutions straight onto the MXU; the trailing normalization + activation
are elementwise and fuse into the conv's epilogue. Kernels are explicit
``self.param`` tensors (not nn.Conv submodules) so the block can sow its
own regularization penalty and so weight-import from TF checkpoints is a
straight tensor copy.

Regularization: instead of Keras per-layer ``.losses`` side outputs, each
block sows its kernel penalty into the ``losses`` collection; the train
step sums that collection inside the same XLA program
(see ops/regularizers.py and training/losses.py).

Bias-free networks: ``use_bias=False`` plus BatchNorm/LayerNorm with
``center=False`` (reference README.md:24-40) keeps the model
scale-equivariant: f(a·x) = a·f(x).
"""

from typing import Any, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from ..constants import (
    DEFAULT_BN_EPSILON,
    DEFAULT_BN_MOMENTUM,
    DEFAULT_LN_EPSILON,
    DEFAULT_RELU_BIAS,
)
from ..ops import regularizers as reg_ops
from ..ops import quant as quant_ops
from .norm import BiasFreeBatchNorm, FastLayerNorm
from .activations import Activation

RegularizerSpec = Union[None, str, dict, list]

_DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def resolve_initializer(name: Any):
    """String → flax initializer (reference kernel_initializer strings)."""
    if callable(name):
        return name
    key = (name or "glorot_normal").strip().lower()
    if key == "glorot_normal":
        return nn.initializers.glorot_normal()
    if key == "glorot_uniform":
        return nn.initializers.glorot_uniform()
    if key == "he_normal":
        return nn.initializers.he_normal()
    if key == "he_uniform":
        return nn.initializers.he_uniform()
    if key in ("trunc_normal", "truncated_normal"):
        # ConvNeXt-style init (reference custom_layers.py:931-936)
        return nn.initializers.truncated_normal(stddev=0.02)
    if key == "zeros":
        return nn.initializers.zeros_init()
    if key == "ones":
        return nn.initializers.ones_init()
    raise ValueError(f"unknown kernel initializer [{name}]")


def default_bn_args(use_bias: bool) -> dict:
    """BN arguments shared by all backbones (reference model.py:268-276)."""
    return dict(
        use_scale=True,
        use_bias=use_bias,  # center=use_bias: bias-free BN when False
        momentum=DEFAULT_BN_MOMENTUM,
        epsilon=DEFAULT_BN_EPSILON,
    )


def default_ln_args(use_bias: bool) -> dict:
    return dict(use_scale=True, use_bias=use_bias, epsilon=DEFAULT_LN_EPSILON)


def sow_regularizer(module: nn.Module, spec: RegularizerSpec,
                    kernel: jnp.ndarray) -> None:
    """Sow a kernel penalty into the 'losses' collection (Keras
    ``layer.add_loss`` analog). No-op when 'losses' isn't mutable (pure
    inference) or spec is None, so serving never pays for it."""
    if spec is None:
        return
    if not module.is_mutable_collection("losses"):
        return
    penalty = reg_ops.builder(spec)(kernel.astype(jnp.float32))
    module.sow("losses", "regularization", penalty,
               init_fn=lambda: jnp.zeros((), jnp.float32),
               reduce_fn=lambda a, b: a + b)


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


class ConvBlock(nn.Module):
    """conv → optional BN → optional LN → activation → dropout.

    Attributes mirror the reference's conv_params dict keys so backbone
    builders translate configs one-to-one.
    """
    features: int = 0
    kernel_size: Union[int, Sequence[int]] = (3, 3)
    strides: Union[int, Sequence[int]] = (1, 1)
    padding: str = "SAME"
    use_bias: bool = False
    groups: int = 1
    depth_multiplier: Optional[int] = None   # not None → depthwise conv
    transpose: bool = False
    separable: bool = False
    activation: str = "linear"
    kernel_initializer: Any = "glorot_normal"
    kernel_regularizer: RegularizerSpec = None
    use_bn: bool = False
    use_ln: bool = False
    bn_center: bool = False       # BN/LN beta (center) — off for bias-free
    bn_bias_free: bool = False    # strict bias-free BN (no mean subtraction)
    dropout_rate: float = 0.0
    spatial_dropout_rate: float = 0.0
    dtype: Any = None             # compute dtype (bfloat16 for TPU MXU)

    def _conv_param(self, name: str, shape) -> jnp.ndarray:
        k = self.param(name, resolve_initializer(self.kernel_initializer), shape)
        sow_regularizer(self, self.kernel_regularizer, k)
        return k

    def _bias_param(self, features: int) -> jnp.ndarray:
        act = (self.activation or "linear").strip().lower()
        # ReLU-family biased convs start slightly positive
        # (reference utilities.py:172-175)
        init = (nn.initializers.constant(DEFAULT_RELU_BIAS)
                if act in ("relu", "relu6") else nn.initializers.zeros_init())
        return self.param("bias", init, (features,))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        strides = _pair(self.strides)
        in_features = x.shape[-1]
        compute_dtype = self.dtype or x.dtype

        if self.transpose:
            kernel = self._conv_param("kernel", (kh, kw, in_features, self.features))
            y = lax.conv_transpose(
                x.astype(compute_dtype), kernel.astype(compute_dtype),
                strides=strides, padding=self.padding,
                dimension_numbers=_DIMENSION_NUMBERS)
            out_features = self.features
        elif self.separable:
            dw = self._conv_param("depthwise_kernel", (kh, kw, 1, in_features))
            pw = self._conv_param("pointwise_kernel", (1, 1, in_features, self.features))
            y = lax.conv_general_dilated(
                x.astype(compute_dtype), dw.astype(compute_dtype),
                window_strides=strides, padding=self.padding,
                dimension_numbers=_DIMENSION_NUMBERS,
                feature_group_count=in_features)
            y = lax.conv_general_dilated(
                y, pw.astype(compute_dtype), window_strides=(1, 1),
                padding="SAME", dimension_numbers=_DIMENSION_NUMBERS)
            out_features = self.features
        elif self.depth_multiplier is not None:
            # int8 PTQ hooks live in quant_ops.conv2d: under the
            # quant_mode('calibrate'/'int8') trace-time context this conv
            # records its input scale / runs int8 x int8 -> int32 on the
            # MXU (transpose/separable above keep the float path)
            m = int(self.depth_multiplier)
            kernel = self._conv_param("kernel", (kh, kw, 1, in_features * m))
            y = quant_ops.conv2d(self, "in", x, kernel,
                                 strides=strides, padding=self.padding,
                                 groups=in_features,
                                 compute_dtype=compute_dtype)
            out_features = in_features * m
        else:
            groups = max(1, int(self.groups))
            kernel = self._conv_param(
                "kernel", (kh, kw, in_features // groups, self.features))
            y = quant_ops.conv2d(self, "in", x, kernel,
                                 strides=strides, padding=self.padding,
                                 groups=groups,
                                 compute_dtype=compute_dtype)
            out_features = self.features

        if self.use_bias:
            y = y + self._bias_param(out_features).astype(compute_dtype)

        if self.use_bn:
            if self.bn_bias_free:
                # strict bias-free BN: no mean subtraction (layers/norm.py)
                y = BiasFreeBatchNorm(
                    use_running_average=not train,
                    momentum=DEFAULT_BN_MOMENTUM,
                    epsilon=DEFAULT_BN_EPSILON,
                    dtype=compute_dtype,
                    name="bn")(y)
            else:
                y = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=DEFAULT_BN_MOMENTUM,
                    epsilon=DEFAULT_BN_EPSILON,
                    use_bias=self.bn_center,
                    use_scale=True,
                    # resolved compute dtype, not self.dtype: flax BN with
                    # dtype=None promotes bf16 inputs to f32 via its f32
                    # params, silently doubling HBM bytes downstream
                    dtype=compute_dtype,
                    name="bn")(y)
        if self.use_ln:
            y = FastLayerNorm(
                epsilon=DEFAULT_LN_EPSILON,
                use_bias=self.bn_center,
                use_scale=True,
                dtype=self.dtype,
                name="ln")(y)

        act = (self.activation or "linear").strip().lower()
        if act != "linear":
            y = Activation(act, name="act")(y)

        if self.dropout_rate > 0.0:
            y = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train, name="dropout")(y)
        if self.spatial_dropout_rate > 0.0:
            # SpatialDropout2D semantics: drop whole channels per sample
            y = nn.Dropout(rate=self.spatial_dropout_rate,
                           broadcast_dims=(1, 2),
                           deterministic=not train, name="dropout2d")(y)
        return y


def conv_block_from_params(params: dict, name: str,
                           use_bn: bool = False, use_ln: bool = False,
                           bn_center: bool = False,
                           bn_bias_free: bool = False, dtype: Any = None,
                           **overrides) -> "ConvBlock":
    """Translate a reference-schema conv-params dict (kernel_size / filters /
    depth_multiplier / groups / strides / padding / use_bias / activation /
    kernel_regularizer / kernel_initializer) into a ConvBlock."""
    p = dict(params or {})
    p.update(overrides)
    return ConvBlock(
        features=p.get("filters", 0),
        kernel_size=p.get("kernel_size", 3),
        strides=p.get("strides", (1, 1)),
        padding=str(p.get("padding", "SAME")).upper(),
        use_bias=p.get("use_bias", False),
        groups=p.get("groups", 1),
        depth_multiplier=p.get("depth_multiplier", None),
        transpose=p.get("transpose", False),
        separable=p.get("separable", False),
        activation=p.get("activation", "linear"),
        kernel_initializer=p.get("kernel_initializer",
                                 p.get("depthwise_initializer", "glorot_normal")),
        kernel_regularizer=p.get("kernel_regularizer",
                                 p.get("depthwise_regularizer", None)),
        use_bn=use_bn, use_ln=use_ln, bn_center=bn_center,
        bn_bias_free=bn_bias_free,
        dropout_rate=p.get("dropout_rate", 0.0),
        spatial_dropout_rate=p.get("spatial_dropout_rate", 0.0),
        dtype=dtype, name=name)


class DenseBlock(nn.Module):
    """dense → optional BN → activation (reference dense_wrapper)."""
    features: int
    use_bias: bool = False
    activation: str = "linear"
    kernel_initializer: Any = "glorot_normal"
    kernel_regularizer: RegularizerSpec = None
    use_bn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kernel = self.param(
            "kernel", resolve_initializer(self.kernel_initializer),
            (x.shape[-1], self.features))
        sow_regularizer(self, self.kernel_regularizer, kernel)
        compute_dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(compute_dtype), kernel.astype(compute_dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,))
            y = y + bias.astype(compute_dtype)
        if self.use_bn:
            y = nn.BatchNorm(
                use_running_average=not train,
                momentum=DEFAULT_BN_MOMENTUM,
                epsilon=DEFAULT_BN_EPSILON,
                use_bias=False, dtype=self.dtype, name="bn")(y)
        act = (self.activation or "linear").strip().lower()
        if act != "linear":
            y = Activation(act, name="act")(y)
        return y
