"""Packaged evaluation images.

The reference ships four classic 512×512 photographs for its periodic
noise-sweep evaluation (reference bfcnn/images/__init__.py:16-23,
train_loop.py:87-96). Shipping third-party photographs is avoided here;
instead four deterministic synthetic 512×512 images with comparable
frequency content (smooth gradients, edges, texture, mixed) are generated
on first use. Users can drop real images into this directory — any
``*.png/*.jpg`` found here is used instead.
"""

import glob
import os
from typing import List

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))

evaluation_image_paths: List[str] = sorted(
    glob.glob(os.path.join(_DIR, "*.png"))
    + glob.glob(os.path.join(_DIR, "*.jpg")))


def _synthetic(idx: int, size: int = 512) -> np.ndarray:
    """Deterministic synthetic eval image #idx, uint8 HWC RGB."""
    rng = np.random.default_rng(1000 + idx)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    if idx == 0:      # smooth gradients
        img = np.stack([xx, yy, (xx + yy) / 2], axis=-1)
    elif idx == 1:    # hard edges (checker + bars)
        checker = ((np.floor(xx * 8) + np.floor(yy * 8)) % 2)
        bars = (np.floor(xx * 32) % 2)
        img = np.stack([checker, bars, (checker + bars) / 2], axis=-1)
    elif idx == 2:    # band-limited texture
        img = np.zeros((size, size, 3), np.float32)
        for f, a in ((4, 1.0), (16, 0.5), (64, 0.25)):
            phase = rng.uniform(0, 2 * np.pi, 6)
            for c in range(3):
                img[:, :, c] += a * np.sin(
                    2 * np.pi * f * (xx * np.cos(phase[c])
                                     + yy * np.sin(phase[c]))
                    + phase[3 + c])
        img = (img - img.min()) / max(float(np.ptp(img)), 1e-6)
    else:             # mixed: gradient + shapes
        img = np.stack([xx, 1 - yy, xx * yy], axis=-1)
        cy, cx, r = size // 2, size // 2, size // 4
        mask = (yy * size - cy) ** 2 + (xx * size - cx) ** 2 < r * r
        img[mask] = 1.0 - img[mask]
    return np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)


def load_evaluation_images(size: int = 512) -> np.ndarray:
    """[4, size, size, 3] float32 eval batch in [0, 255]."""
    if evaluation_image_paths:
        from ..data.file_operations import load_image
        imgs = [load_image(p, image_size=(size, size), num_channels=3)
                for p in evaluation_image_paths[:4]]
        return np.stack(imgs, axis=0).astype(np.float32)
    return np.stack([_synthetic(i, size) for i in range(4)],
                    axis=0).astype(np.float32)
