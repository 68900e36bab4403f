"""blind_image_denoising_tpu — TPU-native JAX framework for blind image
denoising with bias-free CNNs.

A from-scratch JAX/Flax/Pallas/pjit re-design with the capabilities of
NikolasMarkou/blind_image_denoising (TF2/Keras reference mounted at
/root/reference). See SURVEY.md for the component map.
"""

__author__ = "bfcnn-tpu authors"
__version__ = "0.1.0"
__license__ = "MIT"

import os as _os
import pathlib as _pathlib

from .logger import logger
from .config import load_config, save_config, input_shape_fixer
from . import ops
from .ops.pyramid import (
    build_pyramid_fn as build_pyramid_model,
    build_inverse_pyramid_fn as build_inverse_pyramid_model,
)

_current_dir = _pathlib.Path(__file__).parent.resolve()
_configs_dir = _current_dir / "configs"

# (filename, config-dict) pairs — same structure as the reference registry
# (reference __init__.py:40-48)
configs = [
    (_os.path.basename(str(c)), load_config(str(c)))
    for c in sorted(_configs_dir.glob("*.json"))
]

CONFIGS_DICT = {
    _os.path.splitext(name)[0]: cfg for name, cfg in configs
}

__all__ = [
    "logger",
    "load_config",
    "save_config",
    "input_shape_fixer",
    "ops",
    "configs",
    "CONFIGS_DICT",
    "build_pyramid_model",
    "build_inverse_pyramid_model",
]
