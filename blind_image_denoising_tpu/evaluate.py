"""Noise-sweep quality evaluation harness.

Reproduces the reference's README MAE benchmark protocol
(reference README.md:66-92): corrupt evaluation images with additive
truncated-normal noise over a std sweep, denoise, report MAE(noisy) /
MAE(denoised) per std plus PSNR/SSIM. Works with any denoiser callable
(a native exported artifact, the TFLite pretrained graph, or a live
TrainState via training.train_step.build_eval_step).

CLI: ``python -m blind_image_denoising_tpu.evaluate
        --model <registry-name-or-artifact-dir> [--images DIR]``
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
    parser.add_argument("--quant", action="store_true",
                        help="evaluate the artifact's int8 path "
                             "(needs quant.msgpack; docs/QUANTIZATION.md)")
    parser.add_argument("--tta", action="store_true",
                        help="8-way geometric self-ensemble (dihedral "
                             "test-time augmentation) — ~8x compute for "
                             "a measured MAE gain")
    args = parser.parse_args(argv)

    if getattr(args, "platform", None):
        import jax
        jax.config.update("jax_platforms", args.platform)

    import blind_image_denoising_tpu as bid
    denoiser = bid.load_model(args.model, quant=args.quant, tta=args.tta)
    images = load_eval_images(args.images, size=args.size,
                              limit=args.limit)
    logger.info(f"evaluating {len(images)} images at {args.size}^2")
    stds = ([float(s) for s in args.stds.split(",")] if args.stds
            else DEFAULT_STDS)
    records = noise_sweep(denoiser, images, stds=stds)
    print(json.dumps(records, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
