"""Blend ORACLE analysis: what is the best any alpha calibration could do?

Fits single-band and two-band (several split scales) alphas DIRECTLY on
the held-out evaluation errors — an upper bound on every honest
calibration — for each packaged candidate model, at the contested sigma
levels. Decides (round 5) whether the remaining README rows (sigma 5/10)
are reachable by calibration transfer at all, or capped by the model's
reconstruction floor.

Run on the tunneled TPU: python scripts/oracle_blend.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

KITTI_DIR = "/root/reference/images/test/kitti/files"
HELD_OUT = ("kitti_0000000000.png", "kitti_0000000042.png",
            "kitti_0000000659.png", "kitti_0000003471.png")
SIGMAS = (1, 5, 10, 20)
README = {1: 4.33, 5: 3.39, 10: 5.19, 20: 6.60}


def held_out_crops(size=256) -> np.ndarray:
    from blind_image_denoising_tpu.data.file_operations import load_image
    crops = []
    for f in HELD_OUT:
        img = load_image(os.path.join(KITTI_DIR, f), num_channels=3)
        for x0 in range(0, img.shape[1] - size + 1, size):
            crops.append(img[:size, x0:x0 + size])
    return np.stack(crops).astype(np.float32)


def main():
    import jax.numpy as jnp
    import blind_image_denoising_tpu as bid
    from blind_image_denoising_tpu.inference.blend import (
        _optimal_alpha, _optimal_alpha2)
    from blind_image_denoising_tpu.ops.gaussian import gaussian_blur

    clean = held_out_crops()
    print(f"eval crops: {clean.shape}", flush=True)
    rng = np.random.default_rng(0)

    candidates = [
        ("flagship", dict(blend=False)),
        ("flagship tta4", dict(blend=False, tta=4)),
        ("v56_highnoise", dict(blend=False)),
    ]
    names = {"flagship": "unet_laplacian_v6_tpu_scratch",
             "flagship tta4": "unet_laplacian_v6_tpu_scratch",
             "v56_highnoise": "unet_laplacian_v56_highnoise"}

    report = {}
    for label, kw in candidates:
        den = bid.load_model(names[label], **kw)
        rows = []
        for sigma in SIGMAS:
            n = np.clip(rng.normal(0, sigma, clean.shape),
                        -2 * sigma, 2 * sigma)
            noisy = np.clip(np.round(clean + n), 0, 255).astype(np.float32)
            y = np.asarray(den.float_forward(noisy), np.float32)
            err_in = noisy - clean
            err_out = y - clean
            row = {"sigma": sigma, "readme": README[sigma],
                   "mae_noisy": round(float(np.abs(err_in).mean()), 3),
                   "mae_model": round(float(np.abs(err_out).mean()), 3)}
            a1 = _optimal_alpha(err_in, err_out, 101)
            m1 = float(np.abs(a1 * err_out + (1 - a1) * err_in).mean())
            row["oracle_1band"] = {"alpha": a1, "mae": round(m1, 3)}
            # per-image oracle: one alpha per crop — the bound for any
            # per-image adaptive scheme (e.g. SURE-weighted blending)
            per_img = []
            alphas_img = []
            for i in range(err_in.shape[0]):
                ai = _optimal_alpha(err_in[i:i + 1], err_out[i:i + 1], 101)
                alphas_img.append(ai)
                per_img.append(float(np.abs(
                    ai * err_out[i:i + 1]
                    + (1 - ai) * err_in[i:i + 1]).mean()))
            row["oracle_1band_per_image"] = {
                "mae": round(float(np.mean(per_img)), 3),
                "alpha_min": round(float(np.min(alphas_img)), 2),
                "alpha_max": round(float(np.max(alphas_img)), 2)}
            d = err_out - err_in
            for k, nsig in ((5, 2.0), (9, 3.0), (13, 4.0)):
                dl = np.asarray(gaussian_blur(
                    jnp.asarray(d), (k, k), (nsig, nsig)), np.float32)
                al, ah, m2 = _optimal_alpha2(err_in, dl, d - dl, 101)
                row[f"oracle_2band_k{k}"] = {
                    "alpha_low": al, "alpha_high": ah, "mae": round(m2, 3)}
            rows.append(row)
            print(json.dumps(row), flush=True)
        report[label] = rows

    with open("/tmp/oracle_blend.json", "w") as f:
        json.dump(report, f, indent=1)
    print("report -> /tmp/oracle_blend.json", flush=True)


if __name__ == "__main__":
    main()
