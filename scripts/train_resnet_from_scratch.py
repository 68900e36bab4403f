"""From-scratch quality milestone: the README-table model family trained
on every mounted frame, evaluated on held-out KITTI with the README's
noise-sweep protocol (VERDICT r2 #4).

The reference's published MAE table (README.md:66-92, BASELINE.md) comes
from `resnet_color_1x18_bn_16x3x3_256x256_l1_relu` trained 20 epochs on
five datasets (KITTI + Megadepth + BDD + WIDER + WFLW). That corpus is
not mounted here — only 35 test frames ship with the reference — so this
run quantifies exactly where from-scratch training lands with the data
that IS available, instead of asserting "needs the full corpus":

* model: the packaged resnet depthwise config (the README model family)
* data: 15/19 KITTI frames + all 16 Megadepth frames; 4 KITTI frames
  held out for evaluation
* protocol: 256x256 held-out crops, truncated-normal noise (+-2 sigma),
  rounded/clipped — the README table's protocol
* output: per-sigma MAE table vs the README numbers -> JSON + markdown
  fragment for docs/TRAINING_DEMO.md

Run on the tunneled TPU (takes ~25 min):
    python scripts/train_resnet_from_scratch.py [--steps 20000]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
from pathlib import Path

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--workdir", default="/tmp/resnet_scratch")
    ap.add_argument(
        "--config",
        default="resnet_color_1x6_bn_32x128x32_1x3x1_128x128_depthwise"
                "_l1_relu",
        help="packaged config name (e.g. unet_laplacian_v6 for the "
             "flagship from-scratch milestone)")
    ap.add_argument("--grad-accum", type=int, default=None,
                    help="override train.gpu_batches_per_step")
    ap.add_argument("--backbone-override", default=None,
                    help="JSON dict merged into model.backbone (e.g. "
                         "'{\"width\": [2,3,3]}' for the per-level TPU "
                         "variants, docs/PERF.md)")
    ap.add_argument("--distill", default=None,
                    help="JSON train.distillation spec, e.g. "
                         "'{\"teacher\": \"unet_laplacian_v56_highnoise\", "
                         "\"dtype\": \"bfloat16\"}' — quality transfer "
                         "from the full-corpus-trained import "
                         "(training/distill.py)")
    ap.add_argument("--noise-sampling", default=None,
                    choices=("uniform", "log_uniform"),
                    help="dataset.noise_sampling override (log_uniform "
                         "spends ~half the std draws below sqrt(lo*hi) — "
                         "the low-sigma training-exposure lever, "
                         "ops/noise.py draw_stds)")
    ap.add_argument("--ema", type=float, default=None,
                    help="train.ema decay (e.g. 0.9995) — weight EMA; "
                         "export/eval then use the averaged weights")
    ap.add_argument("--init-from", default=None,
                    help="checkpoint dir OR exported-artifact dir "
                         "(params.msgpack — e.g. a packaged pretrained "
                         "model's directory) to load initial weights "
                         "from (fine-tune instead of from-scratch)")
    ap.add_argument("--noise-range", default=None,
                    help="dataset.additional_noise override as 'lo,hi' "
                         "(default 1,80); a sub-1 floor plus "
                         "log_uniform sampling is the near-identity "
                         "low-sigma exposure recipe")
    ap.add_argument("--lr", type=float, default=1e-3,
                    help="peak LR of the cosine schedule (fine-tunes "
                         "want ~3e-4)")
    ap.add_argument("--skip-train", action="store_true",
                    help="evaluate an existing checkpoint only")
    args = ap.parse_args()

    work = Path(args.workdir)
    train_files = work / "train_kitti"
    if not args.skip_train:
        shutil.rmtree(work, ignore_errors=True)
        work.mkdir(parents=True)
        train_files.mkdir()
        for f in sorted(os.listdir(KITTI_DIR)):
            if f not in HELD_OUT:
                os.symlink(os.path.join(KITTI_DIR, f), train_files / f)

    import blind_image_denoising_tpu as bid
    cfg = json.loads(json.dumps(bid.CONFIGS_DICT[args.config]))
    if args.backbone_override:
        cfg["model"]["backbone"].update(json.loads(args.backbone_override))
    cfg["dataset"]["inputs"] = [{"directory": str(train_files)},
                                {"directory": MEGADEPTH_DIR}]
    cfg["dataset"]["input_shape"] = [128, 128, 3]
    cfg["dataset"]["batch_size"] = 16
    cfg["dataset"]["repeat"] = True
    cfg["dataset"]["additional_noise"] = [1, 80]   # full README sweep range
    cfg["dataset"]["no_crops_per_image"] = 4
    cfg["dataset"]["min_crop_std"] = 2.0
    if args.noise_sampling:
        cfg["dataset"]["noise_sampling"] = args.noise_sampling
    if args.noise_range:
        lo, hi = (float(v) for v in args.noise_range.split(","))
        cfg["dataset"]["additional_noise"] = [lo, hi]
    cfg["train"]["epochs"] = -1
    cfg["train"]["total_steps"] = args.steps
    if args.grad_accum is not None:
        cfg["train"]["gpu_batches_per_step"] = args.grad_accum
    if args.distill:
        cfg["train"]["distillation"] = json.loads(args.distill)
    if args.ema is not None:
        cfg["train"]["ema"] = args.ema
    cfg["train"]["checkpoint_every"] = 5000
    cfg["train"]["visualization_every"] = -1
    cfg["train"]["use_test_images"] = False
    cfg["train"]["log_every"] = 50
    cfg["train"]["optimizer"]["schedule"] = {
        "type": "cosine_decay",
        "config": {"learning_rate": args.lr, "decay_steps": args.steps,
                   "alpha": 0.02}}
    cfg["tpu"] = {"mesh": {"data": -1}, "compute_dtype": "bfloat16"}
    cfg_path = work / "config.json"
    cfg_path.write_text(json.dumps(cfg, indent=1))

    ckpt = work / "ckpt"
    if not args.skip_train:
        from blind_image_denoising_tpu.training.train_loop import train_loop
        state = train_loop(str(cfg_path), str(ckpt),
                           weights_directory=args.init_from)
        print(f"trained to step {int(state.step)}", flush=True)

    # --- README-protocol evaluation on the held-out KITTI frames
    from blind_image_denoising_tpu.inference.export import export_model
    out_dir = work / "export"
    export_model(str(cfg_path), str(ckpt), str(out_dir), to_stablehlo=False)
    den = bid.load_model(str(out_dir))

    from blind_image_denoising_tpu.data.file_operations import load_image
    crops = []
    for f in HELD_OUT:
        img = load_image(os.path.join(KITTI_DIR, f), num_channels=3)
        for x0 in range(0, img.shape[1] - 256, 256):
            crops.append(img[:256, x0:x0 + 256])
    clean = np.stack(crops).astype(np.float32)
    print(f"eval crops: {clean.shape}", flush=True)

    rng = np.random.default_rng(0)
    rows = []
    for sigma, ref_noisy, ref_den in README_TABLE:
        # truncated-normal (+-2 sigma) additive noise, rounded/clipped —
        # reference dataset.py:208-228 semantics
        n = rng.normal(0, sigma, clean.shape)
        n = np.clip(n, -2 * sigma, 2 * sigma)
        noisy = np.clip(np.round(clean + n), 0, 255).astype(np.uint8)
        out = np.asarray(den(noisy)).astype(np.float32)
        mae_n = float(np.abs(noisy.astype(np.float32) - clean).mean())
        mae_d = float(np.abs(out - clean).mean())
        rows.append({"sigma": sigma, "mae_noisy": round(mae_n, 2),
                     "mae_denoised": round(mae_d, 2),
                     "readme_noisy": ref_noisy, "readme_denoised": ref_den,
                     "gap": round(mae_d - ref_den, 2)})
        print(json.dumps(rows[-1]), flush=True)

    (work / "sweep.json").write_text(json.dumps(rows, indent=1))
    print("\n| σ | MAE noisy | MAE denoised (35 frames) | README denoised "
          "(5-dataset corpus) | gap |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['sigma']} | {r['mae_noisy']} | {r['mae_denoised']} | "
              f"{r['readme_denoised']} | {r['gap']:+.2f} |")


if __name__ == "__main__":
    main()
