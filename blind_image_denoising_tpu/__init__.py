"""blind_image_denoising_tpu — TPU-native JAX framework for blind image
denoising with bias-free CNNs.

A from-scratch JAX/Flax/Pallas/pjit re-design with the capabilities of
NikolasMarkou/blind_image_denoising (TF2/Keras reference mounted at
/root/reference). See SURVEY.md for the component map.

Public API mirrors the reference (__init__.py:21-122): ``configs`` /
``CONFIGS_DICT``, a ``models`` registry of pretrained artifact dirs with
lazy loaders, ``load_model`` / ``load_denoiser_model`` /
``load_default_denoiser``, pyramid builders, and the layer library.
"""

__author__ = "bfcnn-tpu authors"
__version__ = "0.2.0"
__license__ = "MIT"

import os as _os
import pathlib as _pathlib

from .logger import logger


def _enable_compilation_cache():
    """Persistent XLA compilation cache — OPT-IN via the
    JAX_COMPILATION_CACHE_DIR env var. (Not enabled by default: the axon
    TPU backend's remote-compile service deadlocks on even trivial jits
    when the persistent cache is on.)"""
    cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache_dir:
        return
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - older jax
        pass


_enable_compilation_cache()
from .config import load_config, save_config, input_shape_fixer
from . import ops
from .ops.pyramid import (
    build_pyramid_fn as build_pyramid_model,
    build_inverse_pyramid_fn as build_inverse_pyramid_model,
)

_current_dir = _pathlib.Path(__file__).parent.resolve()
_configs_dir = _current_dir / "configs"
_pretrained_dir = _current_dir / "pretrained"

# (filename, config-dict) pairs — same structure as the reference registry
# (reference __init__.py:40-48)
configs = [
    (_os.path.basename(str(c)), load_config(str(c)))
    for c in sorted(_configs_dir.glob("*.json"))
]

CONFIGS_DICT = {
    _os.path.splitext(name)[0]: cfg for name, cfg in configs
}

# --- pretrained model registry (reference __init__.py:54-75): every
# subdirectory of pretrained/ holding an exported artifact becomes an entry.
#
# NOTE: `models` is ALSO the name of the subpackage; importing it first and
# then rebinding the attribute keeps `bid.models` == the registry dict (the
# reference API) while `from blind_image_denoising_tpu.models import ...`
# keeps resolving to the subpackage via sys.modules.
from . import models as _models_subpackage  # noqa: F401  (must come first)

models = {}
_search_dirs = [_pretrained_dir]
# extra pretrained roots (colon-separated), e.g. a mounted reference repo
for _extra in _os.environ.get("BID_TPU_PRETRAINED_PATH", "").split(":"):
    if _extra:
        _search_dirs.append(_pathlib.Path(_extra))
for _root in _search_dirs:
    if not _root.is_dir():
        continue
    for _d in sorted(_root.iterdir()):
        if not _d.is_dir() or _d.name in models:
            continue
        if any((_d / f).is_file() for f in
               ("params.msgpack", "model_hydra.keras",
                "denoiser_model.tflite", "saved_model.pb",
                "denoiser/saved_model.pb")):
            models[_d.name] = {
                "directory": str(_d),
                "configuration": str(_d / "pipeline.json"),
            }


def load_model(name_or_path, quant: bool = False, tta=False, dtype=None,
               blend=None):
    """Load a pretrained denoiser by registry name or artifact directory
    path (reference __init__.py:81-97). Supports both native exported
    artifacts (params.msgpack + pipeline.json) and reference-style
    directories shipping a denoiser_model.tflite (executed as a jitted JAX
    graph, inference/tflite.py).

    ``quant=True`` serves a native artifact's int8 path using its shipped
    calibration scales (export with --quantize; docs/QUANTIZATION.md).

    ``tta`` serves the geometric self-ensemble (dihedral test-time
    augmentation, inference/denoiser.py): ``True``/``8`` = full 8-member
    group, ``4`` = flip subgroup, ``2`` = {id, 180°} — extra compute ∝
    members, measured frontier in docs/QUALITY_BENCHMARK.md;
    native-graph paths only (exported artifacts and the .keras import).

    ``dtype``: serving compute dtype. Default ``None`` honors the
    artifact's own ``tpu.compute_dtype`` (pipeline.json — the dtype it
    was trained in, bfloat16 for the TPU flagship artifacts); pass
    "float32"/"bfloat16" to override. Native-graph paths only.

    ``blend``: noise-adaptive input blending (inference/blend.py) — the
    model output is mixed toward the input by a per-image weight driven
    by a blind noise estimate, so low-noise images are not degraded by
    the model's error floor. Default ``None`` = auto: serve the
    artifact's calibrated ``blend.json`` when it ships one; ``True``
    requires it; ``False`` disables; a path or dict supplies an
    external table. Native-graph paths only."""
    from .inference.export import (load_exported_model,
                                   resolve_compute_dtype, _resolve_blend)
    from pathlib import Path as _Path

    path = (models[name_or_path]["directory"] if name_or_path in models
            else str(name_or_path))
    if not _os.path.isdir(path):
        raise ValueError(
            f"[{name_or_path}] is neither a known pretrained model "
            f"({sorted(models)}) nor an artifact directory")
    if _os.path.isfile(_os.path.join(path, "params.msgpack")):
        return load_exported_model(path, quant=quant, tta=tta, dtype=dtype,
                                   blend=blend)
    if quant:
        raise ValueError(
            f"quant=True needs a native exported artifact with "
            f"quant.msgpack; [{path}] has no params.msgpack")
    keras_path = _os.path.join(path, "model_hydra.keras")
    if _os.path.isfile(keras_path):
        # native import of the reference pretrained weights (runs through
        # the standard any-size Denoiser; preferred over the slower
        # quantized TFLite graph). dtype=None = f32: reference imports
        # carry no tpu.compute_dtype, and parity vs the reference
        # artifact is their contract
        from .inference.import_v56 import build_pretrained_v56
        from .inference.denoiser import Denoiser
        try:
            model, variables = build_pretrained_v56(
                keras_path, dtype=resolve_compute_dtype(dtype))
            return Denoiser(model, variables, pad_mode="pow2", tta=tta,
                            blend=_resolve_blend(_Path(path), blend))
        except Exception as e:
            if tta:
                raise ValueError(
                    f"tta=True needs a native-graph artifact, and the "
                    f"import of [{keras_path}] failed: {e}") from e
            logger.warning(f"native .keras import failed ({e}); "
                           f"falling back to the TFLite graph")
    if tta:
        raise ValueError(
            f"tta=True needs a native-graph artifact (params.msgpack or "
            f"model_hydra.keras); [{path}] has neither")
    if blend:
        raise ValueError(
            f"blend needs a native-graph artifact (params.msgpack or "
            f"model_hydra.keras); [{path}] has neither")
    if resolve_compute_dtype(dtype) is not None:
        raise ValueError(
            f"dtype={dtype!r} needs a native-graph artifact "
            f"(params.msgpack or model_hydra.keras); [{path}] has "
            f"neither — the SavedModel/TFLite fallbacks execute the "
            f"artifact's own graph")
    from .inference.savedmodel import find_savedmodel
    sm_path = find_savedmodel(path)
    if sm_path is not None:
        # reference SavedModel directory (reference __init__.py:88-90) —
        # executed by TF; preferred over the quantized TFLite graph
        from .inference.savedmodel import load_savedmodel_denoiser
        try:
            return load_savedmodel_denoiser(sm_path)
        except Exception as e:
            logger.warning(f"SavedModel load failed ({e}); "
                           f"falling back to the TFLite graph")
    tflite_path = _os.path.join(path, "denoiser_model.tflite")
    if _os.path.isfile(tflite_path):
        from .inference.tflite import load_tflite_denoiser
        import numpy as _np
        fn = load_tflite_denoiser(tflite_path)

        def denoiser(image):
            x = _np.asarray(image)
            squeeze = x.ndim == 3
            if squeeze:
                x = x[None]
            if x.dtype != _np.uint8:
                # clip+round like the Denoiser path (bare astype wraps
                # out-of-range floats modulo 256)
                x = _np.clip(_np.round(x.astype(_np.float64)), 0,
                             255).astype(_np.uint8)
            y = _np.asarray(fn(x))
            return y[0] if squeeze else y

        return denoiser
    raise ValueError(f"no loadable artifact in [{path}]")


# alias: the reference distinguishes the hydra SavedModel from the uint8
# DenoiserModule; here both load to the same any-size uint8 Denoiser
load_denoiser_model = load_model


def load_default_denoiser():
    """Load the first packaged pretrained denoiser
    (reference __init__.py:119-122)."""
    if not models:
        raise ValueError("no pretrained models packaged")
    return load_model(sorted(models)[0])


# --- lazy top-level API (reference __init__.py exports train_loop,
# export_model, model_builder, load_image, schedule_builder,
# optimizer_builder, Multiplier, ChannelwiseMultiplier eagerly; here they
# resolve on first access so `import blind_image_denoising_tpu` stays light)
_LAZY_EXPORTS = {
    "train_loop": ("blind_image_denoising_tpu.training.train_loop",
                   "train_loop"),
    "export_model": ("blind_image_denoising_tpu.inference.export",
                     "export_model"),
    "model_builder": ("blind_image_denoising_tpu.models.hydra",
                      "model_builder"),
    "load_image": ("blind_image_denoising_tpu.data.file_operations",
                   "load_image"),
    "schedule_builder": ("blind_image_denoising_tpu.training.optimizer",
                         "schedule_builder"),
    "optimizer_builder": ("blind_image_denoising_tpu.training.optimizer",
                          "optimizer_builder"),
    "Multiplier": ("blind_image_denoising_tpu.layers.multipliers",
                   "Multiplier"),
    "ChannelwiseMultiplier": ("blind_image_denoising_tpu.layers.multipliers",
                              "ChannelwiseMultiplier"),
}


def __getattr__(name):
    if name in _LAZY_EXPORTS:
        import importlib
        module, attr = _LAZY_EXPORTS[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "logger",
    "load_config",
    "save_config",
    "input_shape_fixer",
    "ops",
    "configs",
    "CONFIGS_DICT",
    "models",
    "load_model",
    "load_denoiser_model",
    "load_default_denoiser",
    "build_pyramid_model",
    "build_inverse_pyramid_model",
] + sorted(_LAZY_EXPORTS)
