"""Flax linen layer/block library.

TPU-native re-designs of the reference's Keras custom layers
(/root/reference/bfcnn/custom_layers.py, backbone_blocks.py,
custom_layers_selector.py, upsampling.py, downsampling.py). Modules are
pure linen; kernel-regularization penalties are sown into the ``losses``
collection (the functional analog of Keras ``model.losses``) and batch-norm
running stats live in ``batch_stats``.
"""

from .activations import activation_fn, Activation
from .conv import ConvBlock, DenseBlock, default_bn_args, default_ln_args
from .multipliers import (
    ChannelLearnableMultiplier,
    SmoothChannelLearnableMultiplier,
    GlobalLearnableMultiplier,
    Multiplier,
    ChannelwiseMultiplier,
)
from .convnext import ConvNextBlock
from .stochastic import StochasticDepth, RandomOnOff
from .attention import (
    AdditiveAttentionGate,
    ConvolutionalSelfAttention,
    NonLocalAttention,
    logit_norm,
)
from .se import SqueezeExcite
from .selector import SelectorBlock
from .sampling import Upsample, Downsample
from .misc import GaussianFilter, ValueCompressor, SparseBlock, GatedMLP
from .blocks import ResnetBlocks, DenseGate
