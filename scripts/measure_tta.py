"""Measure the geometric self-ensemble (TTA) cost/quality FRONTIER.

Evaluates a shipped artifact on the mounted KITTI test frames (256x256
corner crops, the acceptance-gate protocol) at the README sweep stds,
for every TTA operating point — 1 (off), 2 ({id, 180 deg}), 4 (flip
subgroup), 8 (full dihedral group) — and prints per-sigma MAE/PSNR plus
a wall-clock column per member count (each __call__ blocks on a
device_get, so the timing is honest even through the TPU tunnel).

Quality is platform-independent; run with --platform cpu (default) for
quality only, or on the TPU (--platform tpu --dtype bfloat16) for the
throughput column of docs/QUALITY_BENCHMARK.md.

    python scripts/measure_tta.py --model unet_laplacian_v6_tpu_scratch
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KITTI_DIR = "/root/reference/images/test/kitti/files"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="unet_laplacian_v6_tpu_scratch")
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--dtype", default=None,
                    choices=(None, "float32", "bfloat16"))
    ap.add_argument("--stds", default="10,20,40,80")
    ap.add_argument("--members", default="1,2,4,8")
    ap.add_argument("--time-reps", type=int, default=0,
                    help="also time REPS blocking forwards per member "
                         "count (use on an otherwise idle TPU)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np
    import jax.numpy as jnp
    import blind_image_denoising_tpu as bid
    from blind_image_denoising_tpu.data.file_operations import \
        load_corner_crops
    from blind_image_denoising_tpu.inference.denoiser import Denoiser
    from blind_image_denoising_tpu.ops.losses import psnr

    clean = load_corner_crops(KITTI_DIR)
    clean_j = jnp.asarray(clean)
    stds = [int(s) for s in args.stds.split(",")]
    members = [int(m) for m in args.members.split(",")]
    rng = np.random.default_rng(0)

    print(f"model={args.model}  frames={clean.shape[0]}  crop=256x256  "
          f"platform={args.platform}  dtype={args.dtype or 'artifact'}")

    # blend=False: every operating point must differ ONLY in TTA members.
    # load_model auto-serves a shipped blend.json, but the m>1 denoisers
    # below are built directly (no blend) — a blended m=1 baseline would
    # corrupt the frontier, especially at low sigma (ADVICE r4)
    plain = bid.load_model(args.model, dtype=args.dtype, blend=False)
    if not isinstance(plain, Denoiser):
        raise SystemExit(
            f"--model {args.model} loaded as {type(plain).__name__}; the "
            f"TTA ensemble needs a native-graph artifact (not a "
            f"TFLite/SavedModel executor)")
    # reuse the loaded graph/params instead of re-deserializing; keep the
    # source's padding config (the .keras import path serves pow2)
    denoisers = {
        m: plain if m == 1 else Denoiser(
            plain.model, plain.variables, tta=m,
            pad_mode=plain._pad_mode, pad_multiple=plain._pad_multiple)
        for m in members}

    report = {"model": args.model, "platform": args.platform,
              "dtype": args.dtype, "rows": []}
    hdr = f"{'sigma':>6} {'MAE noisy':>10}"
    for m in members:
        hdr += f" {'MAE@' + str(m):>8} {'PSNR@' + str(m):>8}"
    print(hdr)
    for std in stds:
        n = np.clip(rng.normal(0, std, clean.shape), -2 * std, 2 * std)
        noisy = np.clip(np.round(clean + n), 0, 255).astype(np.uint8)
        mae_n = float(np.abs(noisy.astype(np.float32) - clean).mean())
        row = {"sigma": std, "mae_noisy": round(mae_n, 3)}
        line = f"{std:>6} {mae_n:>10.2f}"
        for m in members:
            y = jnp.asarray(np.asarray(denoisers[m](noisy)), jnp.float32)
            mae = float(jnp.abs(y - clean_j).mean())
            p = float(psnr(clean_j, y))
            row[f"mae_{m}"] = round(mae, 3)
            row[f"psnr_{m}"] = round(p, 3)
            line += f" {mae:>8.2f} {p:>8.2f}"
        report["rows"].append(row)
        print(line, flush=True)

    if args.time_reps > 0:
        # blocking wall-clock per member count on a fixed batch
        img = np.clip(np.round(
            clean + rng.normal(0, 20, clean.shape)), 0, 255
        ).astype(np.uint8)
        timing = {}
        for m in members:
            den = denoisers[m]
            den(img)  # compile + warm
            best = float("inf")
            for _ in range(args.time_reps):
                t0 = time.perf_counter()
                den(img)
                best = min(best, time.perf_counter() - t0)
            timing[m] = {"batch": int(img.shape[0]),
                         "s_per_batch": round(best, 4),
                         "img_s": round(img.shape[0] / best, 1)}
            print(f"members={m}: {timing[m]}", flush=True)
        report["timing"] = timing

    print("RESULT " + json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
