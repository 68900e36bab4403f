"""Packaged-eval-set representativeness table (VERDICT r4 #8).

The reference ships four classic photographs for its periodic eval sweep
(reference bfcnn/images/__init__.py:16-23); this repo ships four
deterministic synthetic scenes with photographic statistics (dead leaves
+ pink noise, images/__init__.py). This script measures how well a
noise sweep on the PACKAGED set predicts the held-out-KITTI numbers a
user would see on real photos, through the default ``load_model`` path
(bf16 + shipped adaptive blend), and emits the doc table for
docs/QUALITY_BENCHMARK.md "Packaged eval set".

Run (holds the TPU; or --platform cpu for the slow exact path):
    python scripts/eval_packaged_images.py
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

KITTI_DIR = "/root/reference/images/test/kitti/files"
HELD_OUT = ("kitti_0000000000.png", "kitti_0000000042.png",
            "kitti_0000000659.png", "kitti_0000003471.png")
STDS = (1, 5, 10, 20, 30, 40, 50, 60, 70, 80)


def held_out_crops(size: int) -> np.ndarray:
    from blind_image_denoising_tpu.data.file_operations import load_image
    crops = []
    for f in HELD_OUT:
        img = load_image(os.path.join(KITTI_DIR, f), num_channels=3)
        for x0 in range(0, img.shape[1] - size + 1, size):
            crops.append(img[:size, x0:x0 + size])
    return np.stack(crops).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="unet_laplacian_v6_tpu_scratch")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--platform", default=None,
                    help="e.g. cpu (the axon plugin ignores JAX_PLATFORMS;"
                         " set via jax.config before first device use)")
    ap.add_argument("--out", default="/tmp/eval_packaged_images.json")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import blind_image_denoising_tpu as bid
    from blind_image_denoising_tpu.evaluate import noise_sweep
    from blind_image_denoising_tpu.images import load_evaluation_images

    den = bid.load_model(args.model)

    packaged = load_evaluation_images(size=args.size)
    kitti = held_out_crops(args.size)
    print(f"packaged: {packaged.shape}  kitti held-out: {kitti.shape}",
          flush=True)

    report = {"model": args.model, "size": args.size,
              "packaged": noise_sweep(den, packaged, stds=STDS),
              "kitti": noise_sweep(den, kitti, stds=STDS)}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")

    print("\n| σ | packaged noisy→served | KITTI held-out noisy→served "
          "| Δ served |")
    print("|---|---|---|---|")
    for rp, rk in zip(report["packaged"], report["kitti"]):
        print(f"| {rp['noise_std']:.0f} | {rp['mae_noisy']:.2f} → "
              f"{rp['mae_denoised']:.2f} | {rk['mae_noisy']:.2f} → "
              f"{rk['mae_denoised']:.2f} | "
              f"{rp['mae_denoised'] - rk['mae_denoised']:+.2f} |")


if __name__ == "__main__":
    main()
