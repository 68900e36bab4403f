"""Model assembly: backbones + hydra (normalizer → backbone → denoiser
heads → denormalizer).

TPU-native equivalents of reference model.py and backbone_*.py. Backbones
are linen modules built from the same JSON config schema the reference uses,
so reference configs parse unchanged.
"""

from .resnet import ResnetBackbone, ConvNextBackbone
from .unet import UnetBackbone
from .unet_laplacian import UnetLaplacianBackbone
from .segnet import SegnetBackbone
from .hydra import (
    Hydra,
    DenoiserHead,
    BuilderResults,
    model_builder,
    backbone_from_config,
)
