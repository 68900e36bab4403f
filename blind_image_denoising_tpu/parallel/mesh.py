"""Device mesh + data-parallel sharding helpers.

The scaling recipe (jax-ml scaling-book style): pick a mesh, annotate the
shardings of step inputs/outputs, let GSPMD insert the collectives. For the
denoiser workload the natural layout is:

* ``data`` axis — batch dimension of every image tensor (DP). Gradients are
  means over the global batch, so GSPMD emits one psum over ICI per step;
  BatchNorm batch statistics likewise become global automatically.
* ``spatial`` axis (optional) — H dimension for full-frame/4K inference,
  see parallel/spatial.py.

The reference has no distribution at all (SURVEY §2.9); its only
batch-scaling device was sequential gradient accumulation
(train_loop.py:343-348), which we keep as an orthogonal knob inside the
jitted step (training/train_step.py).
"""

from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int = -1, spatial: int = 1, dcn: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'spatial') mesh — or ('dcn', 'data', 'spatial')
    when ``dcn > 1`` for multi-slice training.

    ``data=-1`` → all remaining devices. The 'dcn' axis is outermost so
    slice-local collectives (the heavy per-step gradient reduce over
    'data') ride ICI, and only the slice-level combine crosses the
    data-center network. On real multi-slice hardware pass the
    process-ordered device list from ``jax.devices()`` — JAX orders it
    slice-major, which is exactly the layout the outermost-axis reshape
    assumes; on the virtual CPU mesh any ordering works for testing."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dcn = max(1, int(dcn))
    if data == -1:
        if n % (spatial * dcn) != 0:
            raise ValueError(
                f"{n} devices not divisible by spatial={spatial} x dcn={dcn}")
        data = n // (spatial * dcn)
    if dcn * data * spatial > n:
        raise ValueError(
            f"mesh {dcn}x{data}x{spatial} needs more than {n} devices")
    if dcn > 1:
        grid = np.array(devices[: dcn * data * spatial]).reshape(
            dcn, data, spatial)
        return Mesh(grid, axis_names=("dcn", "data", "spatial"))
    grid = np.array(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(grid, axis_names=("data", "spatial"))


def batch_axes(mesh: Mesh):
    """The mesh axes the batch dimension shards over."""
    return tuple(a for a in ("dcn", "data") if a in mesh.shape)


def data_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Batch tensors: shard dim 0 over 'data' (and 'dcn' when present).

    ``spatial=True`` additionally shards the H dimension (dim 1 of an
    NHWC batch) over the 'spatial' axis — spatially-parallel TRAINING on
    crops larger than one chip's HBM. GSPMD partitions the convolutions
    and inserts the halo exchanges itself (the manual shard_map halo path
    in parallel/spatial.py exists for the inference module's exact
    border semantics); batch-mean losses, BN statistics and gradient
    reductions become cross-axis psums automatically."""
    axes = batch_axes(mesh)
    if spatial and mesh.shape.get("spatial", 1) > 1:
        return NamedSharding(mesh, P(axes, "spatial"))
    return NamedSharding(mesh, P(axes))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Params / scalars: fully replicated."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded over 'data'."""
    return jax.device_put(batch, data_sharding(mesh))


def shard_train_step(train_step, mesh: Mesh, spatial: bool = False):
    """jit the train step with DP shardings: state replicated, batch
    sharded on 'data'. GSPMD inserts the gradient/BN psums over ICI.

    ``spatial=True``: the batch is also H-sharded over 'spatial'
    (see data_sharding) — spatially-parallel training."""
    repl = replicate_sharding(mesh)
    data = data_sharding(mesh, spatial=spatial)
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,))
