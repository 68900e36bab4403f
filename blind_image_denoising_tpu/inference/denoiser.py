"""Any-size uint8 denoiser module.

Equivalent of the reference DenoiserModule (module_denoiser.py:15-75):
uint8 → float32 → pad H/W to the next power of two → hydra forward → take
the finest-scale output → unpad → round → uint8.

XLA discipline: shapes must be static under jit, so padding amounts are
computed in Python and the jitted forward is specialized per power-of-2
bucket — one compilation per bucket (16 buckets cover 1×1…32k×32k), then
cache hits. This is exactly the role ``jit_compile=True`` + pow2 padding
plays in the reference (module_denoiser.py:39-45,56).

Multi-chip: pass a mesh + margin to shard full frames over the 'spatial'
axis with halo exchange (parallel/spatial.py).
"""

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.padding import next_power_of_2
from ..parallel.spatial import denoise_spatially_sharded


class Denoiser:
    def __init__(self, model, variables, cast_to_uint8: bool = True,
                 mesh=None, spatial_margin: int = 0):
        self._model = model
        self._variables = variables
        self._cast = cast_to_uint8
        if mesh is not None and mesh.shape.get("spatial", 1) > 1:
            self._forward = denoise_spatially_sharded(
                lambda v, x: model.apply(v, x, train=False)[0],
                variables, mesh, spatial_margin)
        else:
            self._forward = jax.jit(
                lambda x: model.apply(variables, x, train=False)[0])

    def __call__(self, image) -> np.ndarray:
        """image: uint8/float [H, W, C] or [B, H, W, C]; returns same rank.
        """
        x = jnp.asarray(image)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        x = x.astype(jnp.float32)

        _, h, w, _ = x.shape
        pad_h = next_power_of_2(h) - h
        pad_w = next_power_of_2(w) - w
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

        y = self._forward(x)

        if pad_h or pad_w:
            y = y[:, : y.shape[1] - pad_h, : y.shape[2] - pad_w, :]
        if squeeze:
            y = y[0]
        y = jnp.clip(jnp.round(y), 0.0, 255.0)
        out = np.asarray(y)
        return out.astype(np.uint8) if self._cast else out
