"""Low-sigma fine-tune of the packaged flagship (VERDICT r4 #5).

The remaining README-table gap is σ ∈ {5, 10}: the from-scratch recipe
drew σ ~ U[1, 80], spending only ~11% of samples at σ ≤ 10, so the
model's reconstruction floor at near-clean inputs (MAE 5.7 at σ=5 on
held-out KITTI) is set by under-training, not capacity. This fine-tunes
the shipped artifact with LOG-UNIFORM σ (equal mass per octave — ~half
the draws below √(1·80) ≈ 9, ops/noise.py draw_stds) at a low LR with a
weight EMA, keeping the full [1, 80] range so the high-σ regime cannot
regress unwatched; the post-run sweep verifies every σ against both the
baseline artifact and the README row.

Run on the tunneled TPU (~40 min at 8k steps):
    python scripts/train_lowsigma.py [--steps 8000]
"""

import argparse
import json
import os
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")

KITTI_DIR = "/root/reference/images/test/kitti/files"
MEGADEPTH_DIR = "/root/reference/images/test/megadepth/files"
HELD_OUT = ("kitti_0000000000.png", "kitti_0000000042.png",
            "kitti_0000000659.png", "kitti_0000003471.png")

NOISE_STDS = (1, 5, 10, 20, 30, 40, 50, 60, 70, 80)


def held_out_crops() -> np.ndarray:
    from blind_image_denoising_tpu.data.file_operations import load_image
    crops = []
    for f in HELD_OUT:
        img = load_image(os.path.join(KITTI_DIR, f), num_channels=3)
        for x0 in range(0, img.shape[1] - 255, 256):
            crops.append(img[:256, x0:x0 + 256])
    return np.stack(crops).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--noise", type=float, nargs=2, default=(1.0, 80.0))
    ap.add_argument("--workdir", default="/tmp/lowsigma_scratch")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--config", default="unet_laplacian_v6_tpu")
    ap.add_argument("--init-from", default="unet_laplacian_v6_tpu_scratch")
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    work = Path(args.workdir)
    train_files = work / "train_kitti"
    if not args.skip_train and not args.resume:
        shutil.rmtree(work, ignore_errors=True)
    if not train_files.is_dir():
        work.mkdir(parents=True, exist_ok=True)
        train_files.mkdir()
        for f in sorted(os.listdir(KITTI_DIR)):
            if f not in HELD_OUT:
                os.symlink(os.path.join(KITTI_DIR, f), train_files / f)

    import blind_image_denoising_tpu as bid
    cfg = json.loads(json.dumps(bid.CONFIGS_DICT[args.config]))
    cfg["dataset"]["inputs"] = [{"directory": str(train_files)},
                                {"directory": MEGADEPTH_DIR}]
    cfg["dataset"]["input_shape"] = [128, 128, 3]
    cfg["dataset"]["batch_size"] = 16
    cfg["dataset"]["repeat"] = True
    cfg["dataset"]["no_crops_per_image"] = 4
    cfg["dataset"]["min_crop_std"] = 2.0
    cfg["dataset"]["additional_noise"] = list(args.noise)
    cfg["dataset"]["noise_sampling"] = "log_uniform"   # the one change
    cfg["train"]["epochs"] = -1
    cfg["train"]["total_steps"] = args.steps
    cfg["train"]["ema"] = 0.9995
    cfg["train"]["checkpoint_every"] = 4000
    cfg["train"]["visualization_every"] = -1
    cfg["train"]["use_test_images"] = False
    cfg["train"]["log_every"] = 50
    cfg["train"]["optimizer"]["schedule"] = {
        "type": "cosine_decay",
        "config": {"learning_rate": args.lr, "decay_steps": args.steps,
                   "alpha": 0.1}}
    cfg["tpu"] = {"mesh": {"data": -1}, "compute_dtype": "bfloat16"}
    cfg_path = work / "config.json"
    cfg_path.write_text(json.dumps(cfg, indent=1))

    ckpt = work / "ckpt"
    if not args.skip_train:
        init = args.init_from
        if init in bid.models:
            init = bid.models[init]["directory"]
        from blind_image_denoising_tpu.training.train_loop import train_loop
        state = train_loop(str(cfg_path), str(ckpt), weights_directory=init)
        print(f"trained to step {int(state.step)}", flush=True)

    from blind_image_denoising_tpu.inference.export import export_model
    out_dir = work / "export"
    if not (out_dir / "params.msgpack").exists():
        export_model(str(cfg_path), str(ckpt), str(out_dir),
                     to_stablehlo=False)

    tuned = bid.load_model(str(out_dir), blend=False)
    base = bid.load_model(args.init_from, blend=False)

    clean = held_out_crops()
    print(f"eval crops: {clean.shape}", flush=True)

    from blind_image_denoising_tpu.evaluate import noise_sweep
    report = {}
    for name, den in (("tuned", tuned), ("baseline", base)):
        print(f"--- {name}: pure-noise sweep", flush=True)
        report[name] = noise_sweep(den, clean, stds=NOISE_STDS)
    (work / "lowsigma_sweep.json").write_text(json.dumps(report, indent=1))

    print("\n| σ | noisy MAE | baseline MAE | low-σ-tuned MAE |")
    print("|---|---|---|---|")
    for rb, rt in zip(report["baseline"], report["tuned"]):
        print(f"| {rb['noise_std']:.0f} | {rb['mae_noisy']:.2f} | "
              f"{rb['mae_denoised']:.2f} | {rt['mae_denoised']:.2f} |")


if __name__ == "__main__":
    main()
