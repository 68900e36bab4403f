"""Packaged evaluation images.

The reference ships four classic 512×512 photographs for its periodic
noise-sweep evaluation (reference bfcnn/images/__init__.py:16-23,
train_loop.py:87-96). Shipping third-party photographs is avoided here;
instead four deterministic synthetic 512×512 images with comparable
frequency content (smooth gradients, edges, texture, mixed) are generated
on first use. Two drop-in override paths (both re-checked at every
``load_evaluation_images`` call, so no restart/reimport is needed):

* set ``BID_TPU_EVAL_IMAGES_DIR`` to a directory of images — e.g. the
  reference checkout's ``bfcnn/images/`` to evaluate on its exact four
  classic photos (exercised by tests/test_pretrained.py when the
  reference mount is present), or
* drop ``*.png/*.jpg/*.jpeg/*.bmp`` files into this package directory.
"""

import glob
import os
from typing import List

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_EXTS = ("*.png", "*.jpg", "*.jpeg", "*.bmp")
ENV_DIR = "BID_TPU_EVAL_IMAGES_DIR"


def _glob_images(directory: str) -> List[str]:
    return sorted(sum((glob.glob(os.path.join(directory, e))
                       for e in _EXTS), []))


def discover_evaluation_paths() -> List[str]:
    """Real eval images, first source that has any: the ENV_DIR override
    directory, then files dropped into this package dir. Empty list →
    the synthetic fallback set."""
    env_dir = os.environ.get(ENV_DIR)
    if env_dir:
        paths = _glob_images(env_dir)
        if paths:
            return paths
    return _glob_images(_DIR)


# import-time snapshot of the package dir (kept for API parity with the
# reference's `images` list, reference bfcnn/images/__init__.py:16-23);
# loaders use discover_evaluation_paths() at call time instead
evaluation_image_paths: List[str] = _glob_images(_DIR)


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
    paths = discover_evaluation_paths()
    if paths:
        from ..data.file_operations import load_image
        imgs = [load_image(p, image_size=(size, size), num_channels=3)
                for p in paths[:4]]
        return np.stack(imgs, axis=0).astype(np.float32)
    return np.stack([_synthetic(i, size) for i in range(4)],
                    axis=0).astype(np.float32)
