"""Kernel regularization penalties as explicit pure functions.

The reference attaches Keras regularizers to layers and sums ``model.losses``
(reference regularizers.py, loss.py:181-187). Here regularizers are pure
functions ``w -> scalar`` built by :func:`builder` from the same config
strings/dicts; layers apply them to their own kernels at forward time and
``sow`` the penalties into the Flax 'losses' collection
(layers/conv.py ``sow_regularizer``), which the train step sums — the direct
analog of ``tf.add_n(model.losses)``, but inside one XLA program and only
when the 'losses' collection is mutable (training), so serving never pays.

Includes the ERF (effective receptive field) regularizer that the reference
configs/README.md:17 and README.md:173-185 reference but whose implementation
is missing from the reference snapshot: it penalizes kernel mass near the
spatial center of the kernel, incentivizing wider effective receptive
fields. Implemented from that spec (documented deviation: no reference code
exists to compare against). Coefficient scale validated against the
reference's own experiment configs (configs/old/*erf*.json all use
{"type": "erf", "config": {"l1_coefficient": 0.025, "l2_coefficient":
0.0}} — exactly this module's defaults, and the dict form parses directly).
"""

from collections.abc import Mapping
from enum import Enum
from typing import Callable, Dict, List, Union

import numpy as np
import jax.numpy as jnp

from ..constants import DEFAULT_KERAS_L1, DEFAULT_KERAS_L2


class RegularizationType(Enum):
    L1 = 0
    L2 = 1
    L1L2 = 2
    SOFT_ORTHONORMAL = 3
    SOFT_ORTHOGONAL = 4
    ERF = 5

    @staticmethod
    def from_string(type_str: str) -> "RegularizationType":
        if type_str is None or not isinstance(type_str, str) or not type_str.strip():
            raise ValueError(f"invalid regularization type [{type_str}]")
        return RegularizationType[type_str.strip().upper()]

    def to_string(self) -> str:
        return self.name


def reshape_to_2d(w: jnp.ndarray) -> jnp.ndarray:
    """Kernel -> (out_channels, everything_else) matrix.

    4D HWIO kernels become (O, H*W*I) — same matrix as the reference's
    (out, in*kh*kw) reshape of TF kernels (regularizers.py:159-187), up to
    a column permutation which leaves W·Wᵀ invariant.
    """
    if w.ndim == 2:
        return w.T
    if w.ndim == 4:
        return jnp.moveaxis(w, 3, 0).reshape(w.shape[3], -1)
    return w


def wt_x_w(w: jnp.ndarray) -> jnp.ndarray:
    wt = reshape_to_2d(w)
    return wt @ wt.T


def l1(w: jnp.ndarray, coefficient: float = DEFAULT_KERAS_L1) -> jnp.ndarray:
    return coefficient * jnp.sum(jnp.abs(w))


def l2(w: jnp.ndarray, coefficient: float = DEFAULT_KERAS_L2) -> jnp.ndarray:
    return coefficient * jnp.sum(jnp.square(w))


def l1l2(w: jnp.ndarray, l1_coefficient: float = DEFAULT_KERAS_L1,
         l2_coefficient: float = DEFAULT_KERAS_L2) -> jnp.ndarray:
    return l1(w, l1_coefficient) + l2(w, l2_coefficient)


def soft_orthogonal(w: jnp.ndarray, lambda_coefficient: float = 1.0,
                    l1_coefficient: float = 0.01,
                    l2_coefficient: float = 0.0) -> jnp.ndarray:
    """||off-diag(W Wᵀ)||_F² · λ + L1/L2 on the off-diagonal
    (reference regularizers.py:209-272)."""
    wtw = wt_x_w(w)
    masked = wtw * (1.0 - jnp.eye(wtw.shape[0], dtype=wtw.dtype))
    result = jnp.asarray(0.0, dtype=w.dtype)
    if lambda_coefficient > 0.0:
        result += lambda_coefficient * jnp.sum(jnp.square(masked))
    if l1_coefficient > 0.0:
        result += l1(masked, l1_coefficient)
    if l2_coefficient > 0.0:
        result += l2(masked, l2_coefficient)
    return result


def soft_orthonormal(w: jnp.ndarray, lambda_coefficient: float = 1.0,
                     l1_coefficient: float = 0.001,
                     l2_coefficient: float = 0.0) -> jnp.ndarray:
    """||W Wᵀ - I||_F² · λ + L1/L2 on W Wᵀ (reference regularizers.py:278-338)."""
    wtw = wt_x_w(w)
    eye = jnp.eye(wtw.shape[0], dtype=wtw.dtype)
    result = jnp.asarray(0.0, dtype=w.dtype)
    if lambda_coefficient > 0.0:
        result += lambda_coefficient * jnp.sum(jnp.square(wtw - eye))
    if l1_coefficient > 0.0:
        result += l1(wtw, l1_coefficient)
    if l2_coefficient > 0.0:
        result += l2(wtw, l2_coefficient)
    return result


def _center_mask(kh: int, kw: int) -> np.ndarray:
    """Center-peaked spatial mask in [0, 1]; 1 at kernel center, ->0 at edges."""
    ys = np.linspace(-1.0, 1.0, kh) if kh > 1 else np.zeros((1,))
    xs = np.linspace(-1.0, 1.0, kw) if kw > 1 else np.zeros((1,))
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    d2 = yy ** 2 + xx ** 2
    return np.exp(-d2 / 0.5).astype(np.float32)


def erf(w: jnp.ndarray, l1_coefficient: float = 0.025,
        l2_coefficient: float = 0.0) -> jnp.ndarray:
    """ERF regularizer: penalize weight mass near the kernel's spatial center.

    Spec from reference README.md:173-185 / configs/README.md (no code in the
    reference snapshot). For non-spatial (2D) weights it degrades to plain
    L1/L2.
    """
    if w.ndim != 4:
        return l1l2(w, l1_coefficient, l2_coefficient)
    mask = jnp.asarray(_center_mask(w.shape[0], w.shape[1]),
                       dtype=w.dtype)[:, :, None, None]
    result = jnp.asarray(0.0, dtype=w.dtype)
    if l1_coefficient > 0.0:
        result += l1_coefficient * jnp.sum(jnp.abs(w) * mask)
    if l2_coefficient > 0.0:
        result += l2_coefficient * jnp.sum(jnp.square(w) * mask)
    return result


RegFn = Callable[[jnp.ndarray], jnp.ndarray]


def _builder_helper(config: Union[str, Dict]) -> RegFn:
    if isinstance(config, str):
        reg_type, params = config, {}
    elif isinstance(config, Mapping):
        reg_type = config.get("type")
        params = dict(config.get("config", {}))
    elif callable(config):
        return config
    else:
        raise ValueError(f"don't know how to handle config [{config}]")

    rt = RegularizationType.from_string(reg_type)
    if rt == RegularizationType.L1:
        c = params.get("l1", DEFAULT_KERAS_L1)
        return lambda w: l1(w, c)
    if rt == RegularizationType.L2:
        c = params.get("l2", DEFAULT_KERAS_L2)
        return lambda w: l2(w, c)
    if rt == RegularizationType.L1L2:
        c1 = params.get("l1", DEFAULT_KERAS_L1)
        c2 = params.get("l2", DEFAULT_KERAS_L2)
        return lambda w: l1l2(w, c1, c2)
    if rt == RegularizationType.SOFT_ORTHONORMAL:
        return lambda w: soft_orthonormal(w, **params)
    if rt == RegularizationType.SOFT_ORTHOGONAL:
        return lambda w: soft_orthogonal(w, **params)
    if rt == RegularizationType.ERF:
        return lambda w: erf(w, **params)
    raise ValueError(f"don't know how to handle [{rt}]")


def builder(config: Union[str, Dict, List]) -> RegFn:
    """Build a single or mixed regularization function
    (reference regularizers.py:81-154)."""
    if config is None:
        raise ValueError("config cannot be None")
    if isinstance(config, (list, tuple)):
        fns = [_builder_helper(c) for c in config]
        return lambda w: sum(fn(w) for fn in fns)
    return _builder_helper(config)
