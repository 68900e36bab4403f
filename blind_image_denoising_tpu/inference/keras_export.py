"""Keras-format (.keras) artifact emission.

Closes the last packaging gap vs the reference: its build/export paths
save the hydra as a ``.keras`` archive for offline inspection (netron)
and Keras-ecosystem consumption (reference build.py:35-38,
export_model.py:106-110, constants.py:32 ``model_hydra.keras``). This
repo already READS reference ``.keras`` archives (inference/import_v56
pulls raw tensors out of the zip); this module is the symmetric WRITE.

Design: the hydra stays a JAX/Flax model — there is no layer-by-layer
Keras re-implementation to save (that would be a second model to keep
in sync). Instead :class:`HydraLayer` is a genuine ``tf_keras`` custom
layer whose weights ARE the flattened Flax variable leaves (created via
``add_weight`` with their Flax path names, so netron shows every tensor
with shape + name) and whose ``call`` runs the hydra forward through a
``jax2tf`` graph-serialized conversion fed by those weights. The layer
carries the model config in ``get_config``, so
``tf_keras.models.load_model(path, custom_objects={"HydraLayer":
HydraLayer})`` rebuilds the hydra from config, restores the trained
weights from the archive, and reproduces the JAX forward (round-trip
tested, tests/test_savedmodel.py). TensorFlow is an emission-time
dependency only — nothing in the serving/training path imports it.
"""

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..logger import logger

KERAS_FILE = "model_hydra.keras"


def _leaf_paths(variables) -> list:
    """Stable (path-string, leaf) pairs for all variable collections."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    out = []
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        out.append((name, leaf))
    return out


def _make_layer_class():
    """Build the HydraLayer class lazily (importing TF costs ~30 s; keep
    it out of module import — CLAUDE.md)."""
    import tf_keras

    class HydraLayer(tf_keras.layers.Layer):
        """The full hydra forward as one Keras layer.

        Weights: the flattened Flax leaves (params + batch_stats etc.),
        named by their Flax path. Forward: jax2tf graph serialization of
        ``hydra.apply`` with the weights fed as inputs, so the saved
        archive is self-contained and the restored layer computes with
        ITS weights (fine-tunable in principle, though the intended use
        is inspection/serving parity).
        """

        def __init__(self, model_config: dict, channels: int = 3, **kw):
            super().__init__(**kw)
            from jax.experimental import jax2tf
            from ..models.hydra import model_builder

            self.model_config = dict(model_config)
            self.channels = int(channels)
            self._hydra = model_builder(self.model_config).hydra
            sample = jnp.zeros((1, 32, 32, self.channels), jnp.float32)
            template = self._hydra.init(
                {"params": jax.random.PRNGKey(0)}, sample, train=False)
            # init also sows a "losses" collection (regularization
            # penalties) — serve-time variables carry only these two
            template = {k: v for k, v in template.items()
                        if k in ("params", "batch_stats")}
            self._template_leaves = _leaf_paths(template)
            self._treedef = jax.tree_util.tree_structure(template)

            hydra, treedef = self._hydra, self._treedef

            def fwd(leaves, x):
                variables = jax.tree_util.tree_unflatten(treedef, leaves)
                return tuple(hydra.apply(variables, x, train=False))

            # graph serialization (pure TF ops): the archive must load
            # without a matching XlaCallModule custom-op build
            self._tf_fn = jax2tf.convert(
                fwd, native_serialization=False,
                polymorphic_shapes=[None, f"(b, h, w, {self.channels})"])

        def build(self, input_shape):
            self._leaf_weights = [
                self.add_weight(
                    name=name, shape=leaf.shape,
                    dtype=str(leaf.dtype),
                    initializer="zeros",
                    trainable=name.startswith("params/"))
                for name, leaf in self._template_leaves]
            super().build(input_shape)

        def call(self, x):
            import tensorflow as tf
            leaves = [tf.convert_to_tensor(w) for w in self._leaf_weights]
            return list(self._tf_fn(leaves, x))

        def get_config(self):
            cfg = super().get_config()
            cfg.update(model_config=self.model_config,
                       channels=self.channels)
            return cfg

    return HydraLayer


def save_hydra_keras(model_config: dict, variables, path: str,
                     channels: Optional[int] = None) -> str:
    """Save the hydra + trained variables as a ``.keras`` archive.

    model_config: the pipeline config's ``model`` section (stored in the
    archive; reload rebuilds the hydra from it). variables: the full
    Flax variable dict ({"params": ..., optional "batch_stats": ...}).
    """
    try:
        import tf_keras
    except ImportError as e:  # pragma: no cover — TF is emission-time only
        raise RuntimeError(
            f".keras emission needs tf_keras installed ({e}); the "
            f"msgpack/StableHLO/SavedModel artifacts cover deployment"
        ) from e

    if channels is None:
        shape = (model_config.get("backbone", model_config)
                 .get("input_shape", [None, None, 3]))
        channels = int(shape[-1])

    HydraLayer = _make_layer_class()
    layer = HydraLayer(model_config, channels=channels, name="hydra")

    # serve-time collections only (init output also carries sown
    # "losses" regularization values — not weights)
    variables = {k: v for k, v in variables.items()
                 if k in ("params", "batch_stats")}
    # the trained variables must flatten exactly like the init template
    trained = _leaf_paths(variables)
    sig_t = [(n, tuple(v.shape)) for n, v in trained]
    sig_i = [(n, tuple(v.shape)) for n, v in layer._template_leaves]
    if sig_t != sig_i:
        raise ValueError(
            f"variables do not match the config's hydra structure: "
            f"{sorted(set(sig_t) ^ set(sig_i))[:5]} ...")

    inp = tf_keras.Input(shape=(None, None, channels), dtype="float32",
                         name="input")
    outputs = layer(inp)
    model = tf_keras.Model(inp, outputs, name="hydra")
    layer.set_weights([np.asarray(leaf, leaf.dtype) for _, leaf in trained])
    if not str(path).endswith(".keras"):
        raise ValueError(f"path must end with .keras, got [{path}]")
    model.save(path)
    logger.info(f"wrote Keras archive to [{path}] "
                f"({len(trained)} weight tensors)")
    return str(path)


def load_hydra_keras(path: str):
    """Round-trip read: reload an archive written by save_hydra_keras
    into a callable(float32 NHWC) -> list of scale outputs."""
    import tf_keras
    model = tf_keras.models.load_model(
        path, custom_objects={"HydraLayer": _make_layer_class()})

    def forward(x):
        out = model(np.asarray(x, np.float32))
        # Keras unwraps a single-element output list to the bare tensor
        if not isinstance(out, (list, tuple)):
            out = [out]
        return [np.asarray(o) for o in out]

    return forward
