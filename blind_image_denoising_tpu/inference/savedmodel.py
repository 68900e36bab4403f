"""TensorFlow SavedModel import path.

Closes the one reference entry point with no counterpart (reference
__init__.py:88-90 ``tf.saved_model.load``): a reference user arriving
with only a SavedModel directory — the artifact ``export_model.py``
produces with a ``[1, None, None, C]`` uint8 ``DenoiserModule``
signature — can load it here directly. TensorFlow executes the graph
(import-time dependency only; the rest of the framework never needs TF).

The symmetric direction also exists: :func:`save_denoiser_savedmodel`
wraps a JAX forward via jax2tf into exactly that reference-style module
and saves it, which is how the round-trip is tested without the
reference's own stripped ``.pb`` blobs
(/root/reference/bfcnn/pretrained/.MISSING_LARGE_BLOBS).
"""

import os
from typing import Callable

import numpy as np

from ..logger import logger


def find_savedmodel(path: str):
    """The SavedModel dir under a reference-style artifact directory:
    either the dir itself or its ``denoiser/`` child (reference
    __init__.py:63-64 layout)."""
    for cand in (path, os.path.join(path, "denoiser")):
        if os.path.isfile(os.path.join(cand, "saved_model.pb")):
            return cand
    return None


def load_savedmodel_denoiser(path: str) -> Callable:
    """Load a reference-style SavedModel into an any-size uint8 → uint8
    numpy callable (accepts [H,W,C] or [B,H,W,C])."""
    try:
        import tensorflow as tf
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            f"loading a SavedModel needs TensorFlow installed ({e})") from e

    m = tf.saved_model.load(path)
    sig = None
    if getattr(m, "signatures", None) and "serving_default" in m.signatures:
        sig = m.signatures["serving_default"]

    # a genuine reference export has a FIXED batch-1 [1, None, None, C]
    # signature (reference export_model.py:129-132) — batched inputs must
    # be fed image-by-image or TF rejects the shape
    batch_fixed = None
    if sig is not None:
        specs = [s for s in tf.nest.flatten(sig.structured_input_signature,
                                            expand_composites=True)
                 if isinstance(s, tf.TensorSpec)]
        if len(specs) == 1 and specs[0].shape.rank == 4:
            batch_fixed = specs[0].shape[0]  # None when polymorphic

    def call(x):
        if sig is not None:
            out = sig(tf.constant(x))
            if isinstance(out, dict):
                out = next(iter(out.values()))
            return out
        return m(x)

    logger.info(f"loaded SavedModel from {path}"
                + (" (serving_default)" if sig is not None else "")
                + (f" (fixed batch {batch_fixed})"
                   if batch_fixed is not None else ""))

    def denoiser(image: np.ndarray) -> np.ndarray:
        x = np.asarray(image)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        if x.dtype != np.uint8:
            # clip+round like the Denoiser path — a bare astype would
            # wrap out-of-range floats modulo 256
            x = np.clip(np.round(x.astype(np.float64)), 0,
                        255).astype(np.uint8)
        if batch_fixed is not None and x.shape[0] != batch_fixed:
            if batch_fixed != 1:
                raise ValueError(
                    f"SavedModel signature has fixed batch {batch_fixed}; "
                    f"got batch {x.shape[0]}")
            y = np.concatenate(
                [np.asarray(call(x[i:i + 1])) for i in range(x.shape[0])],
                axis=0)
        else:
            y = np.asarray(call(x))
        if y.dtype != np.uint8:
            y = np.clip(np.round(y), 0, 255).astype(np.uint8)
        return y[0] if squeeze else y

    return denoiser


def save_denoiser_savedmodel(model, variables, directory: str,
                             channels: int = 3) -> str:
    """Export the finest-scale forward as a reference-style SavedModel:
    a module whose serving signature is uint8 [1, None, None, C] →
    uint8, like the reference DenoiserModule (module_denoiser.py:46-73;
    export_model.py:129-140)."""
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            f"SavedModel export needs TensorFlow installed ({e})") from e

    def fwd(x):
        import jax.numpy as jnp
        y = model.apply(variables, x.astype(jnp.float32), train=False)[0]
        return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)

    tf_fn = jax2tf.convert(fwd, native_serialization=False,
                           polymorphic_shapes=[f"(b, h, w, {channels})"])

    class DenoiserModule(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([None, None, None, channels], tf.uint8)])
        def __call__(self, x):
            return tf_fn(x)

    module = DenoiserModule()
    tf.saved_model.save(
        module, directory,
        signatures=module.__call__.get_concrete_function())
    logger.info(f"wrote SavedModel to {directory}")
    return directory
