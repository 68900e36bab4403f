"""Noise-sweep quality evaluation harness.

Reproduces the reference's README MAE benchmark protocol
(reference README.md:66-92): corrupt evaluation images with additive
truncated-normal noise over a std sweep, denoise, report MAE(noisy) /
MAE(denoised) per std plus PSNR/SSIM. Works with any denoiser callable
(a native exported artifact, the TFLite pretrained graph, or a live
TrainState via training.train_step.build_eval_step).

Beyond the reference protocol, ``degradation_sweep`` measures blind
RESTORATION robustness on deterministic corruption chains built from the
on-device degradation suite (ops/degradations.py — the reference's five
parsed-but-dead dataset options made real): JPEG at a fixed quality,
Gaussian blur at a fixed sigma, bit-depth posterization, inpainting
holes, and compositions like ``blur:1.5+noise:25`` applied left to
right. The reference has no analog (its evaluation is Gaussian-only,
reference README.md:66-92).

CLI: ``python -m blind_image_denoising_tpu.evaluate
        --model <registry-name-or-artifact-dir> [--images DIR]
        [--degradations blur:1.5+noise:25,jpeg:50,...]``
prints a JSON report.
"""

import argparse
import glob
import json
import os
import sys
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from .logger import logger

DEFAULT_STDS = (1, 5, 10, 20, 30, 40, 50, 60, 70, 80)


def noise_sweep(
        denoiser: Callable[[np.ndarray], np.ndarray],
        images: np.ndarray,
        stds: Sequence[float] = DEFAULT_STDS,
        seed: int = 0) -> List[Dict]:
    """images: [N, H, W, C] float32 in [0, 255]. Returns one record per
    std with MAE/PSNR/SSIM of noisy and denoised vs clean."""
    import jax.numpy as jnp
    from .ops.losses import psnr
    from .ops.ssim import ssim

    import jax.random as jrandom
    from .ops.noise import corrupt_batch_fixed_std

    records = []
    for i, std in enumerate(stds):
        if std > 0:
            # true ±2σ truncated normal (redraw semantics, matching
            # tf.random.truncated_normal and the README protocol) — the
            # same corruption the train-loop eval sweep uses
            noisy = np.clip(np.asarray(corrupt_batch_fixed_std(
                jrandom.fold_in(jrandom.PRNGKey(seed), i),
                images, std=float(std))), 0, 255)
        else:
            noisy = images
        den = np.asarray(denoiser(noisy.astype(np.uint8))).astype(np.float32)

        clean_j = jnp.asarray(images)
        rec = {
            "noise_std": float(std),
            "mae_noisy": float(np.abs(noisy - images).mean()),
            "mae_denoised": float(np.abs(den - images).mean()),
            "psnr_noisy": float(psnr(clean_j, jnp.asarray(noisy, jnp.float32))),
            "psnr_denoised": float(psnr(clean_j, jnp.asarray(den))),
            "ssim_noisy": float(ssim(clean_j,
                                     jnp.asarray(noisy, jnp.float32)).mean()),
            "ssim_denoised": float(ssim(clean_j, jnp.asarray(den)).mean()),
        }
        records.append(rec)
        logger.info(
            f"std {std}: mae {rec['mae_noisy']:.2f}->"
            f"{rec['mae_denoised']:.2f} psnr {rec['psnr_noisy']:.1f}->"
            f"{rec['psnr_denoised']:.1f}")
    return records


# steps accepted by parse_degradation_spec: name -> value meaning
DEGRADATION_STEPS = {
    "noise": "additive truncated-normal std (gray levels)",
    "jpeg": "JPEG quality in [1, 100] (Annex-K DCT quantization)",
    "blur": "Gaussian blur sigma (pixels)",
    "posterize": "bit-depth step (round to multiples of q)",
    "holes": "per-pixel dropout rate in [0, 1)",
}


def parse_degradation_spec(spec: str) -> List:
    """``"blur:1.5+noise:25"`` → ``[("blur", 1.5), ("noise", 25.0)]``.
    Steps apply left to right; unknown names or bad values raise."""
    steps = []
    for part in spec.split("+"):
        part = part.strip()
        if not part:
            raise ValueError(f"empty step in degradation spec [{spec}]")
        name, sep, value = part.partition(":")
        name = name.strip().lower()
        if name not in DEGRADATION_STEPS:
            raise ValueError(
                f"unknown degradation [{name}] in [{spec}]; known: "
                f"{sorted(DEGRADATION_STEPS)}")
        if not sep:
            raise ValueError(f"degradation [{part}] needs a :value "
                             f"({DEGRADATION_STEPS[name]})")
        v = float(value)
        ok = {"noise": 0.0 <= v,
              "jpeg": 1.0 <= v <= 100.0,
              "blur": 0.0 < v,
              "posterize": 1.0 <= v,
              "holes": 0.0 <= v < 1.0}[name]
        if not (ok and np.isfinite(v)):
            raise ValueError(
                f"degradation [{name}:{value}] out of range "
                f"({DEGRADATION_STEPS[name]})")
        steps.append((name, v))
    return steps


def apply_degradations(images: np.ndarray, spec: str,
                       seed: int = 0) -> np.ndarray:
    """Corrupt [N,H,W,C] float images in [0,255] with the deterministic
    chain ``spec`` (see ``parse_degradation_spec``). Stochastic steps
    (noise, holes) derive their key from ``seed`` and the step index, so
    a given (spec, seed) is reproducible. Returns float32 in [0,255],
    rounded to integers like a stored image."""
    import jax.numpy as jnp
    import jax.random as jrandom
    from .ops.noise import corrupt_batch_fixed_std
    from .ops.degradations import (
        inpaint_dropout, jpeg_artifacts, quantize_batch,
        separable_blur_batch)

    x = jnp.asarray(images, jnp.float32)
    n = x.shape[0]
    for i, (name, value) in enumerate(parse_degradation_spec(spec)):
        key = jrandom.fold_in(jrandom.PRNGKey(seed), i)
        if name == "noise":
            x = corrupt_batch_fixed_std(key, x, std=value,
                                        round_values=False)
        elif name == "jpeg":
            x = jpeg_artifacts(x, jnp.full((n,), value, jnp.float32))
        elif name == "blur":
            x = separable_blur_batch(x, jnp.full((n,), value, jnp.float32))
        elif name == "posterize":
            x = quantize_batch(x, value)
        elif name == "holes":
            x = inpaint_dropout(key, x, value)
    return np.clip(np.round(np.asarray(x)), 0, 255).astype(np.float32)


def degradation_sweep(
        denoiser: Callable[[np.ndarray], np.ndarray],
        images: np.ndarray,
        specs: Sequence[str],
        seed: int = 0) -> List[Dict]:
    """Restoration counterpart of ``noise_sweep``: one record per
    corruption chain, with MAE/PSNR/SSIM of the corrupted and restored
    images vs clean."""
    import jax.numpy as jnp
    from .ops.losses import psnr
    from .ops.ssim import ssim

    records = []
    clean_j = jnp.asarray(images)
    for spec in specs:
        corrupt = apply_degradations(images, spec, seed=seed)
        den = np.asarray(
            denoiser(corrupt.astype(np.uint8))).astype(np.float32)
        rec = {
            "degradation": spec,
            "mae_corrupt": float(np.abs(corrupt - images).mean()),
            "mae_restored": float(np.abs(den - images).mean()),
            "psnr_corrupt": float(psnr(clean_j, jnp.asarray(corrupt))),
            "psnr_restored": float(psnr(clean_j, jnp.asarray(den))),
            "ssim_corrupt": float(ssim(clean_j,
                                       jnp.asarray(corrupt)).mean()),
            "ssim_restored": float(ssim(clean_j, jnp.asarray(den)).mean()),
        }
        records.append(rec)
        logger.info(
            f"[{spec}]: mae {rec['mae_corrupt']:.2f}->"
            f"{rec['mae_restored']:.2f} psnr {rec['psnr_corrupt']:.1f}->"
            f"{rec['psnr_restored']:.1f}")
    return records


def load_eval_images(directory: Optional[str], size: int = 256,
                     limit: int = 4) -> np.ndarray:
    from .data.file_operations import load_image
    if directory:
        files = sorted(
            glob.glob(os.path.join(directory, "**", "*.*"), recursive=True))
        files = [f for f in files if f.lower().endswith(
            (".png", ".jpg", ".jpeg"))][:limit]
        if files:
            imgs = [load_image(f, image_size=(size, size), num_channels=3)
                    for f in files]
            return np.stack(imgs, axis=0).astype(np.float32)
        logger.warning(f"no images in [{directory}]; using packaged set")
    from .images import load_evaluation_images
    return load_evaluation_images(size)[:limit]


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="noise-sweep evaluation")
    parser.add_argument("--model", required=True, type=str,
                        help="registry name or artifact directory")
    parser.add_argument("--platform", default=None, type=str,
                        help="force a jax platform (e.g. cpu, tpu) — the "
                             "environment's TPU plugin ignores JAX_PLATFORMS")
    parser.add_argument("--images", default=None, type=str,
                        help="directory of eval images (default: packaged)")
    parser.add_argument("--size", default=256, type=int)
    parser.add_argument("--limit", default=4, type=int,
                        help="max images to evaluate (default 4)")
    parser.add_argument("--stds", default=None, type=str,
                        help="comma-separated noise stds")
    parser.add_argument("--degradations", default=None, type=str,
                        help="comma-separated corruption chains (e.g. "
                             "'blur:1.5+noise:25,jpeg:50,holes:0.1'); "
                             "runs the restoration sweep instead of the "
                             "Gaussian noise sweep. Steps: "
                             + ", ".join(sorted(DEGRADATION_STEPS)))
    parser.add_argument("--quant", action="store_true",
                        help="evaluate the artifact's int8 path "
                             "(needs quant.msgpack; docs/QUANTIZATION.md)")
    parser.add_argument("--tta", nargs="?", const=8, default=0, type=int,
                        choices=(0, 2, 4, 8),
                        help="geometric self-ensemble members: bare flag "
                             "or 8 = full dihedral group, 4 = flip "
                             "subgroup, 2 = {id, 180°} — extra compute ∝ "
                             "members (docs/QUALITY_BENCHMARK.md)")
    parser.add_argument("--blend", nargs="?", const=True, default=None,
                        help="noise-adaptive input blending: bare flag "
                             "requires the artifact's calibrated "
                             "blend.json, or pass a table path; default "
                             "auto-serves a shipped table "
                             "(inference/blend.py; calibrate with "
                             "scripts/calibrate_blend.py)")
    parser.add_argument("--no-blend", dest="blend", action="store_false",
                        help="disable blending even if the artifact "
                             "ships blend.json")
    parser.add_argument("--dtype", default=None, type=str,
                        choices=("float32", "bfloat16"),
                        help="serving compute dtype; default honors the "
                             "artifact's own tpu.compute_dtype "
                             "(pipeline.json)")
    args = parser.parse_args(argv)

    if getattr(args, "platform", None):
        import jax
        jax.config.update("jax_platforms", args.platform)

    import blind_image_denoising_tpu as bid
    denoiser = bid.load_model(args.model, quant=args.quant, tta=args.tta,
                              dtype=args.dtype, blend=args.blend)
    images = load_eval_images(args.images, size=args.size,
                              limit=args.limit)
    logger.info(f"evaluating {len(images)} images at {args.size}^2")
    if args.degradations:
        specs = [s for s in (p.strip()
                             for p in args.degradations.split(",")) if s]
        for spec in specs:
            parse_degradation_spec(spec)  # fail fast before compiles
        records = degradation_sweep(denoiser, images, specs)
    else:
        stds = ([float(s) for s in args.stds.split(",")] if args.stds
                else DEFAULT_STDS)
        records = noise_sweep(denoiser, images, stds=stds)
    print(json.dumps(records, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
