"""Multi-host (multi-process) execution support.

JAX multi-host is multi-controller SPMD: every process runs the SAME
train loop over its local devices, and arrays entering a jitted step are
either

* plain numpy, identical on every process (params at init, PRNG keys,
  deep-supervision weights) — jit places them per its ``in_shardings``, or
* global ``jax.Array``s assembled from per-process local shards with
  ``jax.make_array_from_process_local_data`` (the data batches — each
  process decodes a disjoint file shard, see
  ``data/file_operations.shard_files_for_process``).

Host-side side effects (metrics, checkpoints, eval figures) run on the
primary process only; fully-replicated outputs are addressable everywhere
so the primary can materialize them without collectives.

The reference is strictly single-process (SURVEY §2.9 — no distribution);
this subsystem is new TPU-native capability. Verified end-to-end by
``tests/test_multihost.py``, which launches two real OS processes over a
shared coordinator on the virtual CPU platform and trains the flagship.
"""

import os
from typing import Any, Optional

import numpy as np


def initialize(coordinator_address: str,
               num_processes: int,
               process_id: int,
               platform: Optional[str] = None,
               local_device_count: Optional[int] = None,
               initialization_timeout: int = 600,
               heartbeat_timeout_seconds: int = 600) -> None:
    """Join the JAX distributed runtime. Call BEFORE any device use.

    ``platform``/``local_device_count`` force a simulated host platform
    (e.g. ``cpu`` with N virtual devices per process) for testing the
    multi-process path on machines without multiple accelerators; on real
    multi-host TPU pods leave both unset.

    The timeouts are deliberately generous (2x/6x the jax defaults):
    on a starved host — the dev machine exposes a SINGLE core to this
    cgroup, so N ranks time-slice one CPU — a rank can sit unscheduled
    long enough to miss the default 100 s heartbeat window mid-run or
    stagger past the init barrier, which presented as the coordinator-
    timeout flake in tests/test_multihost.py. Long timeouts only delay
    failure DETECTION of a genuinely dead rank; they never slow a
    healthy cohort (barriers release when the last rank arrives).
    """
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count="
                f"{local_device_count}").strip()

    import jax
    if platform:
        # the axon TPU plugin ignores JAX_PLATFORMS; jax.config is the
        # only reliable override (CLAUDE.md)
        jax.config.update("jax_platforms", platform)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=initialization_timeout,
        heartbeat_timeout_seconds=heartbeat_timeout_seconds)


def process_count() -> int:
    import jax
    try:
        return jax.process_count()
    except Exception:
        return 1


def process_index() -> int:
    import jax
    try:
        return jax.process_index()
    except Exception:
        return 0


def is_primary() -> bool:
    """True on the process that owns host-side side effects."""
    return process_index() == 0


def put_batch(sharding, local_batch: np.ndarray):
    """Place a batch on the mesh.

    Single-process: a plain ``device_put``. Multi-process: assemble the
    GLOBAL array from this process's local rows — the global batch
    dimension is the concatenation of every process's local batch in
    process order (matching the process-major device order of
    ``jax.devices()``).
    """
    import jax
    if sharding is not None and process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, local_batch)
    return jax.device_put(local_batch, sharding)


def replicate(sharding, value: np.ndarray):
    """Fully-replicate a host value (identical on all processes) onto the
    mesh — e.g. the evaluation image batch. With a REPLICATED sharding
    every process supplies the full value, which is exactly put_batch's
    local-shard contract."""
    return put_batch(sharding, np.asarray(value))


def to_host(tree: Any) -> Any:
    """Materialize a (fully-replicated) pytree of global arrays as host
    numpy — e.g. before a primary-only checkpoint save. Non-arrays and
    already-host values pass through."""
    import jax

    def _one(x):
        if isinstance(x, jax.Array):
            if x.is_fully_replicated or len(x.sharding.device_set) == 1:
                return np.asarray(x.addressable_data(0))
            raise ValueError(
                f"to_host on a non-replicated sharded array "
                f"{x.shape} {x.sharding}")
        return x
    return jax.tree_util.tree_map(_one, tree)


def broadcast_from_primary(tree: Any) -> Any:
    """Make the primary process's host pytree authoritative on every rank
    (no-op single-process). Used by the in-loop pruning hook so a
    non-deterministic host-side transform can never desynchronize ranks."""
    if process_count() > 1:
        from jax.experimental import multihost_utils
        tree = multihost_utils.broadcast_one_to_all(tree)
        tree = to_host(tree)
    return tree


def sync(name: str = "sync") -> None:
    """Barrier across processes (no-op single-process).

    Also runs a tiny all-gather over ALL global devices: unlike the
    coordination-service barrier, that forces the cross-process device
    collective context (gloo on CPU, ICI on TPU) to initialize while the
    ranks are aligned — its key exchange has a hard ~30 s timeout that a
    rank-asymmetric startup stall would otherwise trip at the first
    training collective."""
    if process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.process_allgather(np.zeros((1,), np.float32))
        multihost_utils.sync_global_devices(name)
