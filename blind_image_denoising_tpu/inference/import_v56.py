"""Weight import: reference pretrained ``model_hydra.keras`` → native
:class:`~..models.unet_laplacian_v56.UnetLaplacianV56` params.

Reads the float32 tensors from the Keras-v2 .keras archive (a zip holding
``model.weights.h5``; reference pretrained/unet_laplacian_v5.6) and maps
them by layer name onto the flax param tree. Kernel layouts: Keras Conv2D
kernels are already HWIO; DepthwiseConv2D kernels are (H, W, C, mult) and
transpose to the lax grouped-conv (H, W, 1, C) layout.

Output parity against the artifact's own (quantized) TFLite graph is
asserted in tests/test_import_v56.py.
"""

import io
import zipfile
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..logger import logger
from ..models.unet_laplacian_v56 import UnetLaplacianV56

_PREFIX = "_layer_checkpoint_dependencies/"


def read_keras_weights(path: str) -> Dict[str, np.ndarray]:
    """{cleaned/layer/path: array} from a .keras zip archive."""
    import h5py

    z = zipfile.ZipFile(path)
    f = h5py.File(io.BytesIO(z.read("model.weights.h5")), "r")
    out: Dict[str, np.ndarray] = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            clean = name.replace(_PREFIX, "").replace("/vars/0", "")
            out[clean] = np.asarray(obj)

    f.visititems(visit)
    logger.info(f"read {len(out)} weight tensors from {path}")
    return out


def _dw(w: np.ndarray) -> jnp.ndarray:
    """Keras depthwise (H, W, C, 1) → lax grouped (H, W, 1, C)."""
    return jnp.asarray(np.transpose(w, (0, 1, 3, 2)))


def _gamma_param(w: np.ndarray) -> jnp.ndarray:
    """ChannelLearnableMultiplier raw weight (1,1,1,C) → (C,)."""
    return jnp.asarray(w.reshape(-1))


def build_pretrained_v56(keras_path: str, dtype=None):
    """Returns (model, variables) with the pretrained weights loaded.
    ``dtype``: compute dtype for the rebuilt module (e.g. jnp.bfloat16);
    the imported weights stay float32 either way."""
    w = read_keras_weights(keras_path)
    bb = "functional_1/functional/"

    def block(name: str) -> Dict:
        return {
            "conv_1": _dw(w[f"{bb}{name}/conv_1"]),
            "conv_2": jnp.asarray(w[f"{bb}{name}/conv_2"]),
            "conv_3": jnp.asarray(w[f"{bb}{name}/conv_3"]),
            "ln": {"scale": jnp.asarray(w[f"{bb}{name}/ln"])},
            "gamma": {"w": _gamma_param(w[f"{bb}{name}/gamma"])},
        }

    def attn(name: str) -> Dict:
        return {
            "query_conv": jnp.asarray(w[f"{bb}{name}/query_conv"]),
            "key_conv": jnp.asarray(w[f"{bb}{name}/key_conv"]),
            "value_conv": jnp.asarray(w[f"{bb}{name}/value_conv"]),
            "output_fn": jnp.asarray(w[f"{bb}{name}/output_fn"]),
            "ln_0": {"scale": jnp.asarray(w[f"{bb}{name}/ln_0"])},
            "ln_1": {"scale": jnp.asarray(w[f"{bb}{name}/ln_1"])},
            "gamma": {"w": _gamma_param(w[f"{bb}{name}/gamma"])},
        }

    def cnb(i: int) -> str:
        return "conv_next_block" + ("" if i == 0 else f"_{i}")

    def csa(i: int) -> str:
        return "convolutional_self_attention" + ("" if i == 0 else f"_{i}")

    params = {
        "stem": jnp.asarray(w[bb + "conv2d"]),
        "down_0": jnp.asarray(w[bb + "conv2d_2"]),
        "down_1": jnp.asarray(w[bb + "conv2d_4"]),
        "up_1": jnp.asarray(w[bb + "conv2d_6"]),
        "up_0": jnp.asarray(w[bb + "conv2d_8"]),
    }
    for d, base in ((0, 0), (1, 6)):
        for wdt in range(3):
            params[f"enc_{d}_{wdt}"] = block(cnb(base + 2 * wdt))
    for d, base in ((1, 12), (0, 18)):
        for wdt in range(3):
            params[f"dec_{d}_{wdt}"] = block(cnb(base + 2 * wdt))
    for wdt in range(3):
        params[f"attn_{wdt}"] = attn(csa(2 * wdt))

    # standalone output norms + heads (functional_3/5/7 = scales 0/1/2)
    ln_names = {0: "layer_normalization", 1: "layer_normalization_2",
                2: "layer_normalization_4"}
    for i, fn in ((0, "functional_3"), (1, "functional_5"),
                  (2, "functional_7")):
        params[f"out_ln_{i}"] = {"scale": jnp.asarray(w[bb + ln_names[i]])}
        params[f"head_{i}_conv_0"] = jnp.asarray(w[f"{fn}/conv2d"])
        params[f"head_{i}_conv_1"] = jnp.asarray(w[f"{fn}/conv2d_2"])

    model = UnetLaplacianV56(dtype=dtype)
    variables = {"params": params}

    # structural validation against a fresh init
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), all_scales=True))
    ref_flat = jax.tree_util.tree_map(lambda a: a.shape, ref["params"])
    got_flat = jax.tree_util.tree_map(lambda a: a.shape, params)
    if ref_flat != got_flat:
        import flax
        r = flax.traverse_util.flatten_dict(ref_flat, sep="/")
        g = flax.traverse_util.flatten_dict(got_flat, sep="/")
        missing = set(r) - set(g)
        extra = set(g) - set(r)
        mismatch = {k: (r[k], g[k]) for k in set(r) & set(g)
                    if r[k] != g[k]}
        raise ValueError(f"import structure mismatch: missing={missing} "
                         f"extra={extra} shape-mismatch={mismatch}")
    return model, variables
