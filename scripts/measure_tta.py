"""Measure the 8-way geometric self-ensemble (TTA) quality gain.

Evaluates a shipped artifact on the mounted KITTI test frames (256x256
center crops, the acceptance-gate protocol) at the README sweep stds,
with and without ``tta=True``, and prints a per-sigma MAE/PSNR table.

Quality is platform-independent; runs on CPU f32 by default so it does
not contend for the single-tenant TPU.

    python scripts/measure_tta.py --model unet_laplacian_v6_tpu_scratch
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KITTI_DIR = "/root/reference/images/test/kitti/files"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="unet_laplacian_v6_tpu_scratch")
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--stds", default="10,20,40,80")
    args = ap.parse_args()

    import jax
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
    rng = np.random.default_rng(0)

    print(f"model={args.model}  frames={clean.shape[0]}  "
          f"crop=256x256  platform={args.platform}")
    print(f"{'sigma':>6} {'MAE noisy':>10} {'MAE plain':>10} "
          f"{'MAE tta':>9} {'dMAE':>7} {'PSNR plain':>11} {'PSNR tta':>9}")

    plain = bid.load_model(args.model)
    if not isinstance(plain, Denoiser):
        raise SystemExit(
            f"--model {args.model} loaded as {type(plain).__name__}; the "
            f"TTA ensemble needs a native-graph artifact (not a "
            f"TFLite/SavedModel executor)")
    # reuse the loaded graph/params instead of re-deserializing; keep the
    # source's padding config (the .keras import path serves pow2)
    denoisers = {False: plain,
                 True: Denoiser(plain.model, plain.variables, tta=True,
                                pad_mode=plain._pad_mode,
                                pad_multiple=plain._pad_multiple)}

    rows = []
    for std in stds:
        n = np.clip(rng.normal(0, std, clean.shape), -2 * std, 2 * std)
        noisy = np.clip(np.round(clean + n), 0, 255).astype(np.uint8)
        mae_n = float(np.abs(noisy.astype(np.float32) - clean).mean())
        out = {}
        ps = {}
        for tta, den in denoisers.items():
            y = jnp.asarray(np.asarray(den(noisy)), jnp.float32)
            out[tta] = float(jnp.abs(y - clean_j).mean())
            ps[tta] = float(psnr(clean_j, y))
        rows.append((std, mae_n, out[False], out[True],
                     out[False] - out[True], ps[False], ps[True]))
        print(f"{std:>6} {mae_n:>10.2f} {out[False]:>10.2f} "
              f"{out[True]:>9.2f} {out[False]-out[True]:>7.2f} "
              f"{ps[False]:>11.2f} {ps[True]:>9.2f}")


if __name__ == "__main__":
    main()
