"""Teacher-student distillation support.

New capability beyond the reference (it has no distillation path;
SURVEY §5.7's "new-capability axis"): train a small/fast student to mimic
a stronger teacher on whatever data is mounted — the quality-transfer
path for TPU-tuned architecture variants (docs/PERF.md architectural
probe). The motivating use: the per-level-width flagship variants run
1.3–1.7x faster but can only be trained from scratch on the mounted
frames; distilling from the full-corpus-trained
``unet_laplacian_v56_highnoise`` import hands them the teacher's prior.

Config (``train.distillation``)::

    {
      "teacher": "unet_laplacian_v56_highnoise",  # registry name or
                                                  # exported artifact dir
      "weight": 1.0,      # weight on the student-vs-teacher term
      "gt_weight": 1.0,   # weight on the ordinary hard-GT loss
                          # (0 -> pure distillation)
      "dtype": "float32"  # teacher compute dtype ("bfloat16" to halve
                          # teacher HBM traffic)
    }

The teacher runs frozen (``lax.stop_gradient``) inside the jitted train
step, on the SAME corrupted micro-batch the student sees, and only its
finest-scale output is distilled (teacher families disagree on scale
count; hard GT still supervises every student scale). Teacher variables
are closed over — under the DP/spatial meshes they are jit constants,
replicated like the student params.
"""

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..logger import logger


def build_teacher(spec: dict) -> Tuple[Callable, dict]:
    """Resolve ``train.distillation`` into ``(teacher_fn, options)``.

    ``teacher_fn(noisy_f32) -> finest-scale f32 output in [0, 255]``,
    gradients stopped. Accepts any source ``load_model`` accepts: a
    pretrained registry name, an exported artifact directory, or a
    reference-style artifact directory (.keras / TFLite / SavedModel
    interop paths all load through the same surface).
    """
    teacher = spec.get("teacher")
    if not teacher:
        raise ValueError(
            "train.distillation needs a 'teacher' (pretrained registry "
            "name or exported artifact directory)")
    dtype_name = str(spec.get("dtype", "float32"))
    if dtype_name not in ("float32", "bfloat16"):
        raise ValueError(
            f"train.distillation.dtype must be float32 or bfloat16, "
            f"got [{dtype_name}]")
    options = {
        "weight": float(spec.get("weight", 1.0)),
        "gt_weight": float(spec.get("gt_weight", 1.0)),
    }
    if options["weight"] < 0 or options["gt_weight"] < 0:
        raise ValueError("distillation weights must be >= 0")
    if options["weight"] == 0 and options["gt_weight"] == 0:
        raise ValueError(
            "train.distillation: weight and gt_weight are both 0 — "
            "nothing would train")

    from .. import load_model
    den = load_model(str(teacher))
    if not hasattr(den, "model"):
        # TFLite / SavedModel executors run via TF and cannot trace
        # inside the jitted train step
        raise ValueError(
            f"teacher [{teacher}] loaded as a {type(den).__name__}, which "
            f"has no traceable JAX forward — use a native artifact "
            f"(exported dir, .keras import, or packaged pretrained name)")
    model, variables = den.model, den.variables
    cast = jnp.bfloat16 if dtype_name == "bfloat16" else None
    if cast is not None:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(cast)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, variables)

    def teacher_fn(noisy: jnp.ndarray) -> jnp.ndarray:
        x = noisy.astype(cast) if cast is not None else noisy
        y = model.apply(variables, x, train=False)[0]
        return jax.lax.stop_gradient(y.astype(jnp.float32))

    logger.info(
        f"distillation: teacher [{teacher}] ({dtype_name}), "
        f"weight {options['weight']}, gt_weight {options['gt_weight']}")
    return teacher_fn, options
