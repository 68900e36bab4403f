"""Spatial (halo-exchange) sharding for full-frame / 4K denoising.

The CNN analog of sequence/context parallelism: shard the image's H axis
across the mesh's 'spatial' devices, exchange a halo of
``margin`` rows with each neighbor over ICI (one ppermute pair), run the
fully-convolutional denoiser on the locally-padded slab, and crop the halo
off. Because the hydra is fully convolutional, the result equals the
single-device full-frame output wherever the halo covers the receptive
field.

The reference's any-size story is single-device pad-to-pow2 only
(module_denoiser.py:56); multi-chip spatial scaling is new TPU-native
capability (SURVEY §5.7/§5.8).
"""

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] images: shard H over the 'spatial' axis."""
    return NamedSharding(mesh, P(None, "spatial", None, None))


def spatial_shard_image(mesh: Mesh, image: jnp.ndarray) -> jnp.ndarray:
    return jax.device_put(image, spatial_sharding(mesh))


def receptive_field_margin(depth: int, encoder_kernel: int = 5,
                           width: int = 1) -> int:
    """Conservative half-receptive-field for a unet_laplacian-style model:
    each level stacks `width` blocks of k×k depthwise convs, and each
    downsample doubles the stride of everything below it.

    The result is rounded UP to a multiple of 2**depth: strided/pooled 2×
    downsampling samples absolute row parities, so every shard's slab must
    start at a row ≡ 0 (mod the total downsample factor) for the sharded
    pyramid to align with the unsharded one."""
    per_level = (encoder_kernel // 2) * (width + 2) + 2
    margin = 0
    for d in range(depth):
        margin += per_level * (2 ** d)
    factor = 2 ** depth
    return ((margin + factor - 1) // factor) * factor


def denoise_spatially_sharded(
        apply_fn: Callable,
        variables,
        mesh: Mesh,
        margin: int) -> Callable:
    """Build ``fn(image) -> denoised`` running H-sharded over 'spatial'.

    ``apply_fn(variables, x)`` must be the single-device denoiser forward
    (e.g. ``lambda v, x: model.apply(v, x, train=False)[0]``). ``margin``
    must be a multiple of the model's total downsample factor and ≥ its
    half receptive field.
    """
    n_spatial = mesh.shape["spatial"]

    def _local(vars_, x):
        # x: local slab [B, H/n, W, C]
        if n_spatial == 1:
            return apply_fn(vars_, x)
        local_h = x.shape[1]
        if margin > local_h:
            raise ValueError(
                f"halo margin {margin} exceeds the per-shard height "
                f"{local_h}: ppermute can only exchange whole-neighbor "
                f"slabs; use fewer spatial shards or a taller image")
        idx = lax.axis_index("spatial")
        up = [(i, (i + 1) % n_spatial) for i in range(n_spatial)]
        down = [(i, (i - 1) % n_spatial) for i in range(n_spatial)]
        # halo from the neighbor above (its bottom rows) and below (its top rows)
        halo_top = lax.ppermute(x[:, -margin:], "spatial", up)
        halo_bot = lax.ppermute(x[:, :margin], "spatial", down)
        zeros = jnp.zeros_like(halo_top)

        # Boundary shards must present the true image edge AT the slab edge:
        # zero-filled halos are NOT equivalent, because deeper conv layers'
        # SAME padding is zero in their own feature space, not in input
        # space. So the top/bottom shards shift their rows flush against
        # the slab boundary and crop asymmetrically.
        branch = jnp.where(idx == 0, 0,
                           jnp.where(idx == n_spatial - 1, 2, 1))
        slab = lax.switch(
            branch,
            [lambda: jnp.concatenate([x, halo_bot, zeros], axis=1),
             lambda: jnp.concatenate([halo_top, x, halo_bot], axis=1),
             lambda: jnp.concatenate([zeros, halo_top, x], axis=1)])
        start = jnp.where(idx == 0, 0,
                          jnp.where(idx == n_spatial - 1, 2 * margin, margin))

        y = apply_fn(vars_, slab)
        return lax.dynamic_slice_in_dim(y, start, local_h, axis=1)

    sharded = shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(None, "spatial", None, None)),
        out_specs=P(None, "spatial", None, None))

    return jax.jit(lambda image: sharded(variables, image))
