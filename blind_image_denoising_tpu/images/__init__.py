"""Packaged evaluation images.

The reference ships four classic 512×512 photographs for its periodic
noise-sweep evaluation (reference bfcnn/images/__init__.py:16-23,
train_loop.py:87-96). Shipping third-party photographs is avoided here
(and the build environment has no network egress for a CC0 set);
instead four deterministic synthetic 512×512 scenes with PHOTOGRAPHIC
statistics are generated on first use (round 5 — the earlier
checkerboard/gradient set was measurably easier than real photos):

* scenes 0/1/3 build on the **dead-leaves occlusion model** — opaque
  disks with a power-law radius law p(r) ∝ r⁻³ — the standard synthetic
  for natural-image statistics: it is scale-invariant, gives the ~1/f²
  power spectrum and heavy-tailed gradient distribution of photographs,
  and is what camera-IQ dead-leaves charts and recent synthetic-only
  denoiser training use;
* pink (1/f) noise fields add low-contrast texture inside and across
  leaves, and scene 2 is a pure multiscale pink-noise "cloud" for the
  smooth/bokeh regime;
* per-leaf linear shading avoids the flat-cartoon look (real surfaces
  are shaded), keeping intensity histograms spread rather than modal.

The noise-sweep eval numbers measured on this set track the KITTI
held-out numbers far more closely than the old set did
(docs/QUALITY_BENCHMARK.md "Packaged eval set"); statistical properties
are pinned by tests/test_data.py::test_packaged_eval_images_statistics.

Two drop-in override paths (both re-checked at every
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


def _pink_noise(rng: np.random.Generator, size: int,
                beta: float = 1.0) -> np.ndarray:
    """[size, size] zero-mean 1/f^beta ("pink") noise field, unit std."""
    white = rng.normal(0.0, 1.0, (size, size)).astype(np.float32)
    spec = np.fft.rfft2(white)
    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.rfftfreq(size)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = 1.0
    spec *= f ** (-beta)
    spec[0, 0] = 0.0
    field = np.fft.irfft2(spec, s=(size, size)).astype(np.float32)
    return field / max(float(field.std()), 1e-8)


def _power_law_radii(rng: np.random.Generator, n: int,
                     r_min: float, r_max: float,
                     alpha: float = 3.0) -> np.ndarray:
    """n radii with p(r) ∝ r^-alpha on [r_min, r_max] (inverse CDF)."""
    u = rng.uniform(0.0, 1.0, n)
    a1 = 1.0 - alpha
    return (r_min ** a1 + u * (r_max ** a1 - r_min ** a1)) ** (1.0 / a1)


def _dead_leaves(rng: np.random.Generator, size: int,
                 n_leaves: int = 1500, shading: float = 0.25,
                 texture: float = 0.0) -> np.ndarray:
    """[size, size, 3] float dead-leaves scene in [0, 1].

    Opaque disks, power-law radii (scale-invariant occlusions → the
    ~1/f² spectrum and heavy-tailed gradients of photographs), painted
    back-to-front with per-leaf linear shading; optional per-leaf pink
    texture."""
    img = np.empty((size, size, 3), np.float32)
    img[:] = rng.uniform(0.15, 0.85, 3).astype(np.float32)
    radii = _power_law_radii(rng, n_leaves, size * 0.012, size * 0.45)
    centers = rng.uniform(0, size, (n_leaves, 2)).astype(np.float32)
    # correlated RGB: a base luminance + small chroma offsets, like
    # reflectance spectra (independent channels look like confetti)
    lum = rng.uniform(0.08, 0.92, n_leaves).astype(np.float32)
    chroma = rng.uniform(-0.12, 0.12, (n_leaves, 3)).astype(np.float32)
    angles = rng.uniform(0, 2 * np.pi, n_leaves).astype(np.float32)
    tex_field = _pink_noise(rng, size) if texture > 0 else None
    for i in range(n_leaves):
        r, (cy, cx) = float(radii[i]), centers[i]
        y0, y1 = max(0, int(cy - r)), min(size, int(cy + r) + 1)
        x0, x1 = max(0, int(cx - r)), min(size, int(cx + r) + 1)
        if y0 >= y1 or x0 >= x1:
            continue
        yy, xx = np.mgrid[y0:y1, x0:x1].astype(np.float32)
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        if not mask.any():
            continue
        # linear shading along a random direction across the leaf
        shade = ((yy - cy) * np.sin(angles[i])
                 + (xx - cx) * np.cos(angles[i])) / max(r, 1.0)
        val = lum[i] * (1.0 + shading * shade)
        if tex_field is not None:
            val = val + texture * tex_field[y0:y1, x0:x1]
        leaf = val[..., None] + chroma[i]
        region = img[y0:y1, x0:x1]
        region[mask] = np.clip(leaf, 0.0, 1.0)[mask]
    return img


def _synthetic(idx: int, size: int = 512) -> np.ndarray:
    """Deterministic synthetic eval image #idx, uint8 HWC RGB —
    photographic statistics (module docstring)."""
    rng = np.random.default_rng(1000 + idx)
    if idx == 0:      # dead leaves, clean shading (object-dominated)
        img = _dead_leaves(rng, size, n_leaves=1800, shading=0.3)
    elif idx == 1:    # dead leaves + in-leaf pink texture (foliage-like)
        img = _dead_leaves(rng, size, n_leaves=1200, shading=0.2,
                           texture=0.12)
    elif idx == 2:    # multiscale pink-noise cloud (smooth/bokeh regime)
        base = _pink_noise(rng, size, beta=1.4)
        detail = _pink_noise(rng, size, beta=0.8)
        lum = 0.5 + 0.22 * base + 0.06 * detail
        tint = np.array([0.03, 0.0, -0.03], np.float32)
        img = np.clip(lum[..., None] + tint * base[..., None], 0, 1)
    else:             # composite: sky gradient over textured dead leaves
        img = _dead_leaves(rng, size, n_leaves=900, shading=0.25,
                           texture=0.1)
        yy = np.mgrid[0:size, 0:size][0].astype(np.float32) / size
        horizon = 0.38 + 0.04 * _pink_noise(rng, size)[0, :size] # ragged
        sky_t = np.clip((horizon[None, :] - yy) * 14.0, 0.0, 1.0)
        sky = (0.85 - 0.35 * yy)[..., None] * np.array(
            [0.95, 0.97, 1.0], np.float32)
        img = sky_t[..., None] * sky + (1.0 - sky_t[..., None]) * img
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
