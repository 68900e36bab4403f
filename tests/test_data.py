"""Data pipeline tests — shape/range/dtype assertions like the reference's
test_dataset.py:20-131, using generated images instead of packaged KITTI."""

import os

import numpy as np
import pytest

from blind_image_denoising_tpu.data import (
    dataset_builder, image_filenames, load_image, merge_iterators,
    random_crops)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    """A small on-disk dataset of generated PNGs."""
    from PIL import Image
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(6):
        h, w = rng.integers(40, 90), rng.integers(40, 90)
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.png")
    sub = d / "nested"
    sub.mkdir()
    Image.fromarray(np.zeros((50, 50, 3), np.uint8)).save(sub / "z.png")
    return str(d)


def test_image_filenames_recursive(image_dir):
    files = image_filenames(image_dir)
    assert len(files) == 7
    assert all(f.endswith(".png") for f in files)


def test_merge_iterators_round_robin():
    merged = list(merge_iterators(iter([1, 2, 3]), iter("ab")))
    assert merged == [1, "a", 2, "b", 3]


def test_load_image_shapes(image_dir):
    files = image_filenames(image_dir)
    x = load_image(files[0], num_channels=3)
    assert x.ndim == 3 and x.shape[-1] == 3
    assert 0.0 <= x.min() and x.max() <= 255.0

    y = load_image(files[0], image_size=(64, 48), num_channels=3,
                   expand_dims=True, normalize=True)
    assert y.shape == (1, 64, 48, 3)
    assert -0.5 <= y.min() and y.max() <= 0.5

    g = load_image(files[0], num_channels=1)
    assert g.shape[-1] == 1


def test_random_crops_pads_small_images():
    import random
    img = np.ones((10, 10, 3), np.float32)
    crops = random_crops(img, (32, 32), 2, random.Random(0))
    assert all(c.shape == (32, 32, 3) for c in crops)


def test_dataset_builder_real_files(image_dir):
    cfg = {
        "batch_size": 4, "color_mode": "rgb", "no_crops_per_image": 2,
        "value_range": [0, 255], "input_shape": [32, 32, 3],
        "inputs": [{"directory": image_dir}],
    }
    ds = dataset_builder(cfg)
    assert ds.batch_size == 4
    batches = list(ds.training)
    assert len(batches) >= 2   # 7 images × 2 crops // 4
    for b in batches:
        assert b.shape == (4, 32, 32, 3)
        assert b.dtype == np.float32
        assert b.min() >= 0.0 and b.max() <= 255.0
    # second epoch re-iterates
    assert len(list(ds.training)) >= 2


def test_dataset_builder_synthetic_fallback():
    cfg = {"batch_size": 2, "input_shape": [16, 16, 3], "inputs": []}
    ds = dataset_builder(cfg)
    batches = list(ds.training)
    assert batches and batches[0].shape == (2, 16, 16, 3)
    assert batches[0].min() >= 0.0 and batches[0].max() <= 255.0


def test_dataset_repeat_mode_streams_continuously(image_dir):
    cfg = {
        "batch_size": 4, "no_crops_per_image": 1, "repeat": True,
        "input_shape": [16, 16, 3],
        "inputs": [{"directory": image_dir}],
    }
    ds = dataset_builder(cfg)
    it = iter(ds.training)
    # 7 files x 1 crop = 1.75 batches/pass; pulling 10 batches requires
    # looping the file list ~6 times
    batches = [next(it) for _ in range(10)]
    assert all(b.shape == (4, 16, 16, 3) for b in batches)


def test_two_dataset_round_robin_mixing(tmp_path):
    """Multi-input configs interleave datasets 1:1 per epoch regardless of
    size (reference file_operations.py:21-96 semantics), so a small dataset
    is not drowned by a large one."""
    from PIL import Image
    from blind_image_denoising_tpu.data.dataset import (
        _EpochIterable, dataset_builder)

    dirs = []
    for name, n, level in (("small", 3, 10), ("large", 9, 200)):
        d = tmp_path / name
        d.mkdir()
        for i in range(n):
            Image.fromarray(
                np.full((40, 40, 3), level + i, np.uint8)).save(d / f"{i}.png")
        dirs.append(d)

    groups = [image_filenames(str(d)) for d in dirs]
    it = _EpochIterable(groups, batch_size=2, crop_size=(16, 16),
                        no_crops_per_image=1, num_channels=3)
    import random as _random
    order = it._epoch_order(_random.Random(0))
    # one pass covers every file exactly once
    assert sorted(order) == sorted(groups[0] + groups[1])
    # while both datasets are alive the stream alternates 1:1
    head = order[: 2 * len(groups[0])]
    from_small = [p for p in head if "/small/" in p]
    assert len(from_small) == len(groups[0])
    assert [("small" if "/small/" in p else "large") for p in head] == \
        ["small", "large"] * len(groups[0])

    # end-to-end: the built pipeline decodes from both directories
    cfg = {"batch_size": 4, "input_shape": [16, 16, 3],
           "inputs": [{"directory": str(d)} for d in dirs]}
    res = dataset_builder(cfg)
    batches = list(res.training)
    assert batches and all(b.shape == (4, 16, 16, 3) for b in batches)
    seen = np.concatenate([b.reshape(-1) for b in batches])
    assert (seen < 50).any() and (seen > 150).any()


def test_scaled_random_crops(image_dir):
    """crop_scale_range resizes jittered windows back to crop_size; output
    shape is constant and content differs from the unscaled crop."""
    import random as _random
    from blind_image_denoising_tpu.data.dataset import random_crops

    img = np.random.default_rng(0).uniform(0, 255, (96, 96, 3)).astype(np.float32)
    crops = random_crops(img, (32, 32), 8, _random.Random(0),
                         scale_range=(1.5, 2.0))
    assert all(c.shape == (32, 32, 3) for c in crops)
    # a 1.5-2x window resized down cannot equal any raw 32x32 sub-window
    plain = random_crops(img, (32, 32), 8, _random.Random(0))
    assert not all(np.array_equal(a, b) for a, b in zip(crops, plain))
    # identity range short-circuits to raw windows
    same = random_crops(img, (32, 32), 4, _random.Random(1),
                        scale_range=(1.0, 1.0))
    assert all(c.dtype == np.float32 and c.shape == (32, 32, 3) for c in same)


def test_native_decoder_parity(tmp_path):
    """The C++ decode worker must produce exactly what PIL produces for
    PNG and JPEG (JPEG: same libjpeg underneath → identical pixels), with
    graceful fallback when unavailable."""
    from PIL import Image
    from blind_image_denoising_tpu.data import native_decode
    from blind_image_denoising_tpu.data.file_operations import load_image

    if not native_decode.available():
        import pytest as _pytest
        _pytest.skip("native decoder not buildable in this environment")

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (37, 53, 3), np.uint8)
    png = tmp_path / "x.png"
    jpg = tmp_path / "x.jpg"
    Image.fromarray(rgb).save(png)
    Image.fromarray(rgb).save(jpg, quality=90)

    for path in (png, jpg):
        for ch in (1, 3):
            ours = native_decode.decode(str(path), num_channels=ch)
            theirs = np.asarray(
                Image.open(str(path)).convert({1: "L", 3: "RGB"}[ch]))
            if theirs.ndim == 2:
                theirs = theirs[:, :, None]
            assert ours.shape == theirs.shape, (path, ch)
            np.testing.assert_array_equal(ours, theirs, err_msg=f"{path} {ch}")

    # load_image routes through the native path and matches dtype/range
    x = load_image(str(png), num_channels=3)
    assert x.dtype == np.float32 and x.shape == (37, 53, 3)
    np.testing.assert_array_equal(x.astype(np.uint8), rgb)

    # non-image path → native returns None (no crash)
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image")
    assert native_decode.decode(str(bad)) is None


def test_packaged_eval_images_statistics():
    """The packaged synthetic eval set must have PHOTOGRAPHIC statistics
    (VERDICT r4 #8): a ~1/f^2 radially-averaged power spectrum (natural
    images: slope -1.8..-2.6) and heavy-tailed gradients on the
    edge-bearing scenes — the properties that make denoising difficulty
    representative. Deterministic, and scenes must be mutually distinct."""
    from blind_image_denoising_tpu.images import _synthetic

    def spectrum_slope(lum):
        spec = np.abs(np.fft.fft2(lum - lum.mean())) ** 2
        n = lum.shape[0]
        fy = np.fft.fftfreq(n)[:, None]
        fx = np.fft.fftfreq(n)[None, :]
        f = np.sqrt(fy * fy + fx * fx).ravel()
        p = spec.ravel()
        bins = np.logspace(np.log10(4 / n), np.log10(n / 4 / n), 16)
        idx = np.digitize(f, bins)
        fm, pm = [], []
        for b in range(1, 16):
            m = idx == b
            if m.sum() > 10:
                fm.append(f[m].mean())
                pm.append(p[m].mean())
        return np.polyfit(np.log(fm), np.log(pm), 1)[0]

    imgs = [_synthetic(i, 256).astype(np.float32) for i in range(4)]
    for i, im in enumerate(imgs):
        lum = im.mean(-1)
        slope = spectrum_slope(lum)
        assert -3.2 < slope < -1.5, f"scene {i}: spectrum slope {slope}"
        assert 20.0 < lum.std() < 90.0, f"scene {i}: std {lum.std()}"
        # deterministic
        np.testing.assert_array_equal(im, _synthetic(i, 256))
    # heavy-tailed gradients on the occlusion scenes (not the smooth
    # cloud, whose near-Gaussian gradients are its point)
    for i in (0, 1, 3):
        gx = np.diff(imgs[i].mean(-1), axis=1).ravel()
        kurt = float(((gx - gx.mean()) ** 4).mean() / gx.var() ** 2)
        assert kurt > 6.0, f"scene {i}: gradient kurtosis {kurt}"
    # mutually distinct
    for a in range(4):
        for b in range(a + 1, 4):
            assert np.abs(imgs[a] - imgs[b]).mean() > 5.0
