"""Multi-chip parallelism: device mesh, data-parallel sharding, spatial
(halo-exchange) sharding for full-frame inference.

The reference is single-device (SURVEY §2.9) — everything here is new,
TPU-native capability: shardings over a ``jax.sharding.Mesh`` with GSPMD
inserting the ICI collectives.
"""

from .mesh import (
    create_mesh,
    data_sharding,
    replicate_sharding,
    shard_batch,
    shard_train_step,
)
from .spatial import (
    spatial_sharding,
    spatial_shard_image,
    denoise_spatially_sharded,
)
