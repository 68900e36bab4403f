"""Filesystem traversal and image IO.

Equivalent of reference file_operations.py:21-159: recursive image
discovery, round-robin merging of several dataset directories, and a
decode-to-numpy loader (PIL replaces tf.image decode ops).
"""

import itertools
import os
from pathlib import Path
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np

from ..logger import logger

IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".gif", ".ppm", ".webp")


def image_filenames(directory: Union[str, Path]) -> List[str]:
    """Recursively list image files under a directory, sorted."""
    results: List[str] = []
    for root, _, files in os.walk(str(directory)):
        for f in files:
            if f.lower().endswith(IMAGE_EXTENSIONS):
                results.append(os.path.join(root, f))
    results.sort()
    return results


def merge_iterators(*iterators: Iterator) -> Iterator:
    """Round-robin merge, dropping exhausted iterators
    (reference file_operations.py:21-34)."""
    alive = [iter(it) for it in iterators]
    while alive:
        still = []
        for it in alive:
            try:
                yield next(it)
                still.append(it)
            except StopIteration:
                pass
        alive = still


def image_filenames_generator(
        directories: Sequence[Union[str, Path]]) -> Iterator[str]:
    """Round-robin stream of image paths over several dataset directories
    (reference file_operations.py:37-96)."""
    listings = []
    for d in directories:
        files = image_filenames(d)
        if not files:
            logger.warning(f"no images found under [{d}]")
        listings.append(iter(files))
    return merge_iterators(*listings)


def load_image(
        path: Union[str, Path],
        image_size: Optional[Tuple[int, int]] = None,
        num_channels: int = 3,
        expand_dims: bool = False,
        normalize: bool = False,
        dtype=np.float32) -> np.ndarray:
    """Decode an image to numpy HWC (reference file_operations.py:101-159).

    ``image_size`` resizes-with-pad to (H, W) keeping aspect ratio.
    ``normalize`` maps to [-0.5, 0.5]; otherwise values stay in [0, 255].

    JPEG/PNG decode goes through the native C++ worker when it is
    available (data/native_decode.py — GIL-free, no PIL object churn);
    anything it can't handle falls back to PIL.
    """
    if image_size is None:
        from . import native_decode
        native = native_decode.decode(path, num_channels=num_channels)
        if native is not None:
            x = np.asarray(native, dtype=dtype)
            if normalize:
                x = np.clip(x, 0.0, 255.0) / 255.0 - 0.5
            if expand_dims:
                x = x[None, ...]
            return x

    from PIL import Image

    img = Image.open(str(path))
    mode = {1: "L", 3: "RGB", 4: "RGBA"}.get(num_channels)
    if mode is None:
        raise ValueError(f"unsupported num_channels [{num_channels}]")
    img = img.convert(mode)

    if image_size is not None:
        th, tw = int(image_size[0]), int(image_size[1])
        # resize with pad: scale to fit, then center-pad
        scale = min(th / img.height, tw / img.width)
        nh, nw = max(1, round(img.height * scale)), max(1, round(img.width * scale))
        img = img.resize((nw, nh), Image.BILINEAR)
        canvas = Image.new(img.mode, (tw, th))
        canvas.paste(img, ((tw - nw) // 2, (th - nh) // 2))
        img = canvas

    x = np.asarray(img, dtype=dtype)
    if x.ndim == 2:
        x = x[:, :, None]
    if normalize:
        x = np.clip(x, 0.0, 255.0) / 255.0 - 0.5
    if expand_dims:
        x = x[None, ...]
    return x


def load_corner_crops(directory: Union[str, Path], height: int = 256,
                      width: int = 256) -> np.ndarray:
    """Top-left ``[height, width]`` crops of every image in ``directory``
    large enough to supply one, stacked [N, height, width, 3] float32 in
    [0, 255]. The acceptance-gate evaluation protocol (fixed crops, no
    resampling — tests/test_pretrained.py, scripts/measure_tta.py)."""
    crops = []
    for path in image_filenames(directory):
        img = load_image(path, num_channels=3)
        if img.shape[0] >= height and img.shape[1] >= width:
            crops.append(img[:height, :width])
    if not crops:
        raise ValueError(
            f"no images of at least {height}x{width} in [{directory}]")
    return np.stack(crops, axis=0).astype(np.float32)


def shard_files_for_process(file_groups, process_index: int,
                            process_count: int):
    """Disjoint per-host file sharding for multi-host (DCN multi-slice)
    training: each dataset's listing is dealt round-robin by index so every
    host sees ~1/process_count of EVERY dataset — replacing the reference's
    single-host generator (file_operations.py:37-82) with a layout where
    hosts never decode the same file.

    Applied per dataset (before the cross-dataset round-robin merge) so the
    1:1 multi-dataset mixing is preserved on every host."""
    if process_count <= 1:
        return [list(g) for g in file_groups]
    if not 0 <= process_index < process_count:
        raise ValueError(
            f"process_index {process_index} not in [0, {process_count})")
    return [list(g[process_index::process_count]) for g in file_groups]
