"""Host-side input pipeline: file discovery, decode, random crops,
round-robin dataset merging, threaded prefetch.

The device-side tail of the reference's pipeline (flips + noise,
dataset.py:120-238) lives in training/train_step.py where it runs fused on
TPU; the host only decodes and crops.
"""

from .file_operations import (
    image_filenames,
    image_filenames_generator,
    merge_iterators,
    load_image,
)
from .dataset import DatasetResults, dataset_builder, random_crops
