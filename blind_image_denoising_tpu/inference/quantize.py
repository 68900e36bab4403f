"""Post-training int8 quantization: calibration + quantized variables.

TPU-native counterpart of the reference's quantized TFLite export
(reference export_model.py:143-162 — dynamic-range quantization:
``Optimize.DEFAULT`` with no representative dataset, i.e. int8 weights
with float activations; the full-int8 ACTIVATION path here goes beyond
it). The calibration computes
symmetric per-tensor input scales for every ConvBlock by recording input
absolute maxima over representative batches (the ``quant_stats``
collection sown by layers/conv.py under ``quant_mode('calibrate')``);
the resulting ``quant`` collection drives the int8 execution path
(``quant_mode('int8')``).

Usage::

    from blind_image_denoising_tpu.inference.quantize import calibrate
    qvars = calibrate(hydra, variables, images)       # adds 'quant'
    den = Denoiser(hydra, qvars, quant=True)          # int8 serving

Performance status (docs/QUANTIZATION.md): a conv-pair microbenchmark of
the flagship's hot shapes measured int8 2.23x faster than bf16, but
END-TO-END int8 through XLA is currently ~12% slower (434 vs 495 img/s)
because XLA materializes the int32 conv accumulators instead of fusing
the rescale epilogue — which is why serving ships ``quant=False`` by
default. int8 exists for deployment parity and for toolchains whose conv
epilogue fusion keeps the accumulator in registers.
"""

from typing import Dict, Iterable, Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..logger import logger
from ..ops.quant import INT8_MAX, quant_mode


def _rename_amax_to_scale(tree, eps: float = 1e-12):
    """quant_stats {...: {'<site>_amax': a}} -> {...: {'<site>_scale': s}}."""
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            if k.endswith("_amax"):
                a = np.maximum(np.asarray(v, np.float32), eps)
                out[k[:-5] + "_scale"] = jnp.asarray(a / INT8_MAX, jnp.float32)
            else:
                out[k] = _rename_amax_to_scale(v, eps)
        return out
    raise TypeError(f"unexpected quant_stats node {type(tree)}")


def calibrate(model, variables: Dict,
              images: Union[np.ndarray, Iterable[np.ndarray]],
              batch_size: int = 4,
              exclude: tuple = ()) -> Dict:
    """Run representative images through the float model, recording every
    ConvBlock's input amax; return ``variables`` plus the ``quant``
    collection of int8 input scales.

    ``images``: [N, H, W, C] float array in the model's value range
    (e.g. [0, 255]) or an iterable of such batches. Include NOISY samples
    spanning the deployment noise levels — activation ranges grow with
    input noise, and a clean-only calibration clips heavy-noise features.
    """
    @jax.jit
    def stats_of(v, x):
        with quant_mode("calibrate", exclude=exclude):
            _, mutated = model.apply(v, x, train=False,
                                     mutable=["quant_stats"])
        return mutated["quant_stats"]

    if isinstance(images, np.ndarray) or isinstance(images, jnp.ndarray):
        arr = np.asarray(images, np.float32)
        batches = [arr[i:i + batch_size]
                   for i in range(0, len(arr), batch_size)]
    else:
        batches = images

    acc = None
    n = 0
    for batch in batches:
        got = jax.device_get(stats_of(variables, jnp.asarray(batch)))
        acc = got if acc is None else jax.tree_util.tree_map(
            np.maximum, acc, got)
        n += len(batch)
    if acc is None:
        raise ValueError("calibration needs at least one batch")
    scales = _rename_amax_to_scale(acc)
    n_layers = len(jax.tree_util.tree_leaves(scales))
    logger.info(f"int8 calibration: {n} images -> input scales for "
                f"{n_layers} conv blocks")
    out = dict(variables)
    out["quant"] = scales
    return out


def default_calibration_images(noise_stds=(0.0, 10.0, 25.0, 50.0, 80.0),
                               size: int = 256,
                               seed: int = 0) -> np.ndarray:
    """Packaged-eval-image calibration set spanning the deployment noise
    range (the reference's TFLite PTQ likewise feeds a representative
    dataset to its converter)."""
    from ..images import load_evaluation_images
    base = np.asarray(load_evaluation_images(size), np.float32)
    rng = np.random.default_rng(seed)
    out = []
    for std in noise_stds:
        noisy = base + rng.normal(0.0, std, base.shape) if std > 0 else base
        out.append(np.clip(np.round(noisy), 0, 255))
    return np.concatenate(out, axis=0).astype(np.float32)
