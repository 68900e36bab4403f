"""Calibrate noise-adaptive blending for a packaged artifact, then
measure the README-protocol sweep with and without it.

The blend (inference/blend.py) estimates the noise level from the input
and mixes the model output toward the input by a per-artifact calibrated
curve — the fix for the low-sigma regime where ANY trained denoiser's
reconstruction floor exceeds the noise (the reference's own README table
degrades the image at sigma <= 5, reference README.md:83-86).

Calibration frames: the TRAINING split (every mounted KITTI frame NOT in
the held-out evaluation four, plus megadepth) — the held-out frames stay
held out. The resulting ``blend.json`` is written into the artifact
directory, where ``load_model`` auto-serves it.

Run on the tunneled TPU (one compile per sweep level bucket):
    python scripts/calibrate_blend.py [--model unet_laplacian_v6_tpu_scratch]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

KITTI_DIR = "/root/reference/images/test/kitti/files"
MEGADEPTH_DIR = "/root/reference/images/test/megadepth/files"
HELD_OUT = ("kitti_0000000000.png", "kitti_0000000042.png",
            "kitti_0000000659.png", "kitti_0000003471.png")

# README.md:83-92 — (sigma, MAE noisy, MAE denoised) on 256^2 KITTI crops
README_TABLE = [
    (1, 0.65, 4.33), (5, 3.50, 3.39), (10, 6.44, 5.19), (20, 13.22, 6.60),
    (30, 19.84, 8.46), (40, 27.02, 12.95), (50, 30.59, 15.06),
    (60, 34.34, 17.81), (70, 40.64, 22.36), (80, 45.68, 27.99),
]


def crops_from(path: str, size: int = 256, row0: int = 0) -> list:
    from blind_image_denoising_tpu.data.file_operations import load_image
    img = load_image(path, num_channels=3)
    out = []
    if img.shape[0] < row0 + size or img.shape[1] < size:
        return out
    for x0 in range(0, img.shape[1] - size + 1, size):
        out.append(img[row0:row0 + size, x0:x0 + size])
    return out


def synthetic_crops(limit: int, size: int) -> np.ndarray:
    """UNSEEN calibration content: dead-leaves / pink-noise scenes from
    the packaged generator (images/_synthetic — photographic statistics)
    at fresh seeds. Round 5 finding: calibrating on TRAINING-split
    frames overfits — the model's error there is memorization-small, so
    the fitted alphas lean too far toward the model and the two-band
    curve measured WORSE than single-band on held-out KITTI (4.30 vs
    4.17 MAE at sigma=5). Synthetic scenes are content the model has
    never seen, so err_out reflects the true generalization floor while
    the held-out evaluation frames stay held out."""
    from blind_image_denoising_tpu.images import _synthetic
    # seeds disjoint from the packaged eval set (idx 0..3 -> 1000..1003)
    return np.stack([_synthetic(100 + i, size) for i in range(limit)]
                    ).astype(np.float32)


def calibration_crops(limit: int, size: int,
                      include_megadepth: bool = True) -> np.ndarray:
    """Training-split frames only; cap via round-robin over frames so
    the set spans many scenes rather than many crops of one.
    ``include_megadepth=False`` = KITTI train-split only — the right
    calibration content for the v5.6-import artifacts, which fine-tuned
    on megadepth (its err_out there is memorization-small) but never saw
    any of these KITTI frames."""
    per_frame = []
    for f in sorted(os.listdir(KITTI_DIR)):
        if f in HELD_OUT:
            continue
        per_frame.append(crops_from(os.path.join(KITTI_DIR, f), size))
    if include_megadepth:
        for f in sorted(os.listdir(MEGADEPTH_DIR)):
            per_frame.append(crops_from(os.path.join(MEGADEPTH_DIR, f),
                                        size))
    crops, i = [], 0
    while len(crops) < limit and any(per_frame):
        row = per_frame[i % len(per_frame)]
        if row:
            crops.append(row.pop(0))
        i += 1
        if i > 10000:
            break
    return np.stack(crops).astype(np.float32)


def readme_sweep(den, clean: np.ndarray, tag: str) -> list:
    rng = np.random.default_rng(0)
    rows = []
    for sigma, ref_noisy, ref_den in README_TABLE:
        n = rng.normal(0, sigma, clean.shape)
        n = np.clip(n, -2 * sigma, 2 * sigma)
        noisy = np.clip(np.round(clean + n), 0, 255).astype(np.uint8)
        out = np.asarray(den(noisy)).astype(np.float32)
        mae_n = float(np.abs(noisy.astype(np.float32) - clean).mean())
        mae_d = float(np.abs(out - clean).mean())
        rows.append({"sigma": sigma, "mae_noisy": round(mae_n, 2),
                     "mae_denoised": round(mae_d, 2),
                     "readme_noisy": ref_noisy, "readme_denoised": ref_den,
                     "gap": round(mae_d - ref_den, 2), "mode": tag})
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="unet_laplacian_v6_tpu_scratch")
    ap.add_argument("--out", default=None,
                    help="directory for blend.json (default: the "
                         "artifact's own directory)")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--limit", type=int, default=16,
                    help="calibration crops (round-robin over frames)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--bands", type=int, default=1, choices=(1, 2),
                    help="2 = two-band (Gaussian-split) blend: "
                         "independent low/high alpha curves")
    ap.add_argument("--adaptive", action="store_true",
                    help="per-image adaptive mode: alpha_i = "
                         "clip(C(sigma_hat)*N*sigma_hat^2/||y-x||^2) — "
                         "the blind MSE-optimal per-image weight "
                         "(inference/blend.py module docstring)")
    ap.add_argument("--band-nsig", type=float, default=None,
                    help="band-split Gaussian sigma (bands=2; default "
                         "inference/blend.py BAND_NSIG)")
    ap.add_argument("--band-kernel", type=int, default=None,
                    help="band-split Gaussian kernel size (bands=2)")
    ap.add_argument("--calibration", default="train",
                    choices=("train", "synthetic", "kitti"),
                    help="calibration content: 'train' = training-split "
                         "KITTI+megadepth frames; 'synthetic' = unseen "
                         "dead-leaves/pink-noise scenes (see "
                         "synthetic_crops — avoids the memorization "
                         "bias of training frames); 'kitti' = KITTI "
                         "train-split only (unseen content for the "
                         "v5.6-import artifacts, which trained on "
                         "megadepth)")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import blind_image_denoising_tpu as bid
    from blind_image_denoising_tpu.inference.blend import calibrate_blend

    from blind_image_denoising_tpu.inference import blend as blend_mod
    den = bid.load_model(args.model, blend=False)
    cal = (synthetic_crops(args.limit, args.size)
           if args.calibration == "synthetic"
           else calibration_crops(
               args.limit, args.size,
               include_megadepth=args.calibration == "train"))
    print(f"calibration crops: {cal.shape}", flush=True)
    kw = {"bands": args.bands, "adaptive": args.adaptive}
    if args.band_nsig is not None:
        kw["band_nsig"] = args.band_nsig
    if args.band_kernel is not None:
        kw["band_kernel"] = args.band_kernel
    table = calibrate_blend(den.float_forward, cal, **kw)

    out_dir = args.out or (bid.models[args.model]["directory"]
                           if args.model in bid.models else args.model)
    path = table.save(out_dir)
    print(f"blend table -> {path}", flush=True)
    print(json.dumps({"sigma_hat": [round(float(s), 2)
                                    for s in table.sigma_knots],
                      "alpha": [round(float(a), 2)
                                for a in table.alpha_knots]}), flush=True)

    if args.skip_eval:
        return

    # held-out README-protocol sweep, blend off vs on
    eval_crops = []
    for f in HELD_OUT:
        eval_crops.extend(crops_from(os.path.join(KITTI_DIR, f), args.size))
    clean = np.stack(eval_crops).astype(np.float32)
    print(f"eval crops: {clean.shape}", flush=True)

    rows_off = readme_sweep(den, clean, "base")
    # serve the JUST-calibrated table (not the artifact's shipped one —
    # they differ when --out points elsewhere during experiments)
    den_blend = bid.load_model(args.model, blend=table.to_dict())
    rows_on = readme_sweep(den_blend, clean, "blend")

    report = {"model": args.model, "base": rows_off, "blend": rows_on}
    rep_path = os.path.join("/tmp", f"blend_sweep_{args.model}.json")
    with open(rep_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {rep_path}", flush=True)

    print("\n| σ | MAE noisy | base | base+blend | README | gap (blend) |")
    print("|---|---|---|---|---|---|")
    for off, on in zip(rows_off, rows_on):
        print(f"| {off['sigma']} | {off['mae_noisy']} | "
              f"{off['mae_denoised']} | {on['mae_denoised']} | "
              f"{off['readme_denoised']} | {on['gap']:+.2f} |")


if __name__ == "__main__":
    main()
