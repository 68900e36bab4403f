"""Post-hoc weight pruning over parameter pytrees.

Equivalent of reference pruning.py:68-354, acting on the flax params pytree
instead of walking nested Keras models. Strategies: NONE,
MINIMUM_THRESHOLD (zero small weights), MINIMUM_THRESHOLD_BIFURCATE
(re-randomize small weights then re-threshold), MINIMUM_THRESHOLD_SHRINKAGE
(shrink then threshold), PCA_PROJECTION (low-rank PCA reconstruction at a
target explained variance), DROP_BOTTOM (zero the bottom X percentile by
magnitude).

Pruning is a host-side offline utility (like the reference: configured
under train.prune in configs/README.md:55-75 but not invoked by the
training loop), so it's plain numpy — PCA via economic SVD to avoid the
reference's sklearn dependency.
"""

import re
from enum import Enum
from typing import Callable, Dict, List, Optional

import numpy as np

from .logger import logger

PruneFn = Callable[[np.ndarray], np.ndarray]


class PruneStrategy(Enum):
    NONE = 0
    MINIMUM_THRESHOLD = 1
    MINIMUM_THRESHOLD_BIFURCATE = 2
    MINIMUM_THRESHOLD_SHRINKAGE = 3
    PCA_PROJECTION = 4
    DROP_BOTTOM = 5

    @staticmethod
    def from_string(type_str: str) -> "PruneStrategy":
        if type_str is None or not isinstance(type_str, str) \
                or not type_str.strip():
            raise ValueError(f"invalid prune strategy [{type_str}]")
        return PruneStrategy[type_str.strip().upper()]

    def to_string(self) -> str:
        return self.name


def _kernel_to_matrix(w: np.ndarray):
    """HWIO kernel → (H·W·I, O) matrix and inverse metadata."""
    return w.reshape(-1, w.shape[-1]), w.shape


def prune_strategy_helper(strategy: PruneStrategy, **kwargs) -> PruneFn:
    if strategy == PruneStrategy.NONE:
        return lambda x: x

    if strategy == PruneStrategy.MINIMUM_THRESHOLD:
        t = kwargs["minimum_threshold"]

        def fn(x):
            y = x.copy()
            y[np.abs(y) < t] = 0.0
            return y
        return fn

    if strategy == PruneStrategy.MINIMUM_THRESHOLD_BIFURCATE:
        t = kwargs["minimum_threshold"]
        seed = kwargs.get("seed", 0)

        def fn(x):
            rng = np.random.default_rng(seed)
            y = x.copy()
            mask = np.abs(y) < t
            y[mask] = rng.uniform(-2.0 * t, 2.0 * t, size=mask.sum())
            y[np.abs(y) < t] = 0.0
            return y
        return fn

    if strategy == PruneStrategy.MINIMUM_THRESHOLD_SHRINKAGE:
        t = kwargs["minimum_threshold"]
        shrinkage = kwargs["shrinkage"]
        st = kwargs["shrinkage_threshold"]

        def fn(x):
            y = x.copy()
            mask = np.abs(y) < st
            y[mask] *= shrinkage
            y[np.abs(y) < t] = 0.0
            return y
        return fn

    if strategy == PruneStrategy.PCA_PROJECTION:
        variance = kwargs["variance"]   # target explained-variance ratio
        scale = kwargs.get("scale", True)

        def fn(x):
            if x.ndim < 2:
                return x
            mat, shape = _kernel_to_matrix(x)
            mu, sd = 0.0, 1.0
            if scale:
                mu, sd = mat.mean(), mat.std() + 1e-12
                mat = (mat - mu) / sd
            col_mean = mat.mean(axis=0, keepdims=True)
            centered = mat - col_mean
            u, s, vt = np.linalg.svd(centered, full_matrices=False)
            explained = (s ** 2) / max((s ** 2).sum(), 1e-12)
            k = int(np.searchsorted(np.cumsum(explained), variance) + 1)
            k = min(k, len(s))
            recon = (u[:, :k] * s[:k]) @ vt[:k] + col_mean
            if scale:
                recon = recon * sd + mu
            return recon.reshape(shape).astype(x.dtype)
        return fn

    if strategy == PruneStrategy.DROP_BOTTOM:
        percentage = kwargs["percentage"]

        def fn(x):
            y = x.copy()
            flat = np.sort(np.abs(y), axis=None)
            idx = min(len(flat) - 1, int(round(len(flat) * percentage)))
            y[np.abs(y) < flat[idx]] = 0.0
            return y
        return fn

    raise ValueError(f"invalid strategy [{strategy}]")


def get_conv_weights(params, path_pattern: str = "kernel") -> List[np.ndarray]:
    """Collect conv kernels from a params pytree for statistics
    (reference pruning.py:319-352)."""
    import flax
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    pat = re.compile(path_pattern)
    return [np.asarray(w) for path, w in flat.items()
            if pat.search(path) and np.ndim(w) == 4]


def prune_params(params, prune_fn: PruneFn,
                 path_pattern: str = "kernel"):
    """Apply a prune function to every matching 4D conv kernel in the
    params pytree; returns a new pytree
    (reference pruning.py:214-261 prune_conv2d_weights)."""
    import flax
    import jax.numpy as jnp

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    pat = re.compile(path_pattern)
    out = {}
    pruned_count = 0
    for path, w in flat.items():
        if pat.search(path) and np.ndim(w) == 4:
            out[path] = jnp.asarray(prune_fn(np.asarray(w)))
            pruned_count += 1
        else:
            out[path] = w
    logger.info(f"pruned {pruned_count} conv kernels")
    return flax.traverse_util.unflatten_dict(out, sep="/")


def prune_function_builder(config: Optional[Dict]) -> PruneFn:
    """Config → prune fn (reference pruning.py:267-316).

    Config schema: {"strategy": NAME, "config": {...params}}."""
    if config is None or not config:
        return prune_strategy_helper(PruneStrategy.NONE)
    strategy = PruneStrategy.from_string(config.get("strategy", "NONE"))
    params = dict(config.get("config", {}))
    return prune_strategy_helper(strategy, **params)
