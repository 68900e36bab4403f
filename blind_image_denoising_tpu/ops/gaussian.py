"""Gaussian kernels and depthwise Gaussian blur.

Kernel math matches reference utilities.py:272-321 / pyramid.py:27-74 exactly
(linspace grid over +-nsig, unit sigma, normalized), so imported weights and
pyramid decompositions are numerically comparable.
"""

from functools import lru_cache
from typing import Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax


@lru_cache(maxsize=None)
def _gaussian_kernel_2d_np(size: Tuple[int, int], nsig: Tuple[float, float]) -> np.ndarray:
    kern1d = [
        np.linspace(start=-abs(nsig[i]), stop=abs(nsig[i]),
                    num=size[i], endpoint=True, dtype=np.float64)
        for i in range(2)
    ]
    # indexing="ij" keeps axis 0 = size[0]/nsig[0] (H) and axis 1 = W; the
    # default "xy" transposes the grid, crashing non-square sizes and swapping
    # the sigmas between axes. (The reference's utilities.py:272-321 only ever
    # builds square kernels with equal nsig, where the two are identical.)
    x, y = np.meshgrid(kern1d[0], kern1d[1], indexing="ij")
    d = np.sqrt(x * x + y * y)
    g = np.exp(-(d ** 2) / 2.0)
    return (g / g.sum()).astype(np.float64)


def gaussian_kernel_2d(size=(5, 5), nsig=(2.0, 2.0), dtype=np.float32) -> np.ndarray:
    """2D normalized Gaussian grid (reference pyramid.py:27-54)."""
    return _gaussian_kernel_2d_np(tuple(size), tuple(float(n) for n in nsig)).astype(dtype)


def depthwise_gaussian_kernel(channels: int, kernel_size=(5, 5), nsig=(2.0, 2.0),
                              dtype=np.float32) -> np.ndarray:
    """HWIO depthwise kernel [kh, kw, 1, channels] for lax depthwise conv.

    (The reference stores [kh, kw, channels, 1] for tf.nn.depthwise_conv2d,
    utilities.py:304-321 — same per-channel filter, different layout.)
    """
    g = gaussian_kernel_2d(kernel_size, nsig, dtype)
    kernel = np.zeros((kernel_size[0], kernel_size[1], 1, channels), dtype=dtype)
    for c in range(channels):
        kernel[:, :, 0, c] = g
    return kernel


def gaussian_blur(x: jnp.ndarray, kernel_size=(5, 5), nsig=None,
                  strides=(1, 1), padding: str = "SAME") -> jnp.ndarray:
    """Depthwise Gaussian blur (reference GaussianFilter, custom_layers.py:133-168).

    When ``nsig`` is None it defaults to ((k-1)/2, (k-1)/2) like the
    GaussianFilter layer does.
    """
    if nsig is None:
        nsig = ((kernel_size[0] - 1) / 2.0, (kernel_size[1] - 1) / 2.0)
    channels = x.shape[-1]
    kernel = jnp.asarray(
        depthwise_gaussian_kernel(channels, tuple(kernel_size), tuple(nsig)),
        dtype=x.dtype)
    return lax.conv_general_dilated(
        x, kernel,
        window_strides=tuple(strides),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=channels)
