"""Build CLI: construct a hydra from a config and save an inspectable
summary + randomly-initialized params; ``--keras`` additionally emits a
``model_hydra.keras`` archive (the reference build artifact —
bfcnn/build.py:21-64 / constants.py:32 — for netron inspection and
Keras-ecosystem consumption; inference/keras_export.py)."""

import argparse
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import flax.serialization

from .config import load_config
from .logger import logger
from .models.hydra import model_builder


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="build a hydra model from a pipeline config")
    parser.add_argument("--pipeline-config", required=True, type=str)
    parser.add_argument("--output-directory", required=True, type=str)
    parser.add_argument("--platform", default=None, type=str,
                        help="force a jax platform (e.g. cpu) — the "
                             "environment's TPU plugin ignores "
                             "JAX_PLATFORMS")
    parser.add_argument("--keras", action="store_true",
                        help="also emit model_hydra.keras (the reference "
                             "build artifact; needs TensorFlow, ~30 s "
                             "import)")
    args = parser.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    config = load_config(args.pipeline_config)
    out = Path(args.output_directory)
    out.mkdir(parents=True, exist_ok=True)

    results = model_builder(config["model"])
    shape = config["dataset"]["input_shape"]
    sample = jnp.zeros((1, shape[0], shape[1], shape[2]), jnp.float32)
    variables = results.hydra.init(
        {"params": jax.random.PRNGKey(0)}, sample, train=False)

    with open(out / "params.msgpack", "wb") as f:
        f.write(flax.serialization.to_bytes(variables))

    # human-inspectable structure summary (the netron-file analog)
    summary = jax.tree_util.tree_map(
        lambda a: list(a.shape), variables["params"])
    with open(out / "model_structure.json", "w") as f:
        json.dump(summary, f, indent=2)
    n = sum(a.size for a in jax.tree_util.tree_leaves(variables["params"]))
    logger.info(f"built hydra: {n/1e3:.1f}k params → {out}")

    if args.keras:
        from .inference.keras_export import KERAS_FILE, save_hydra_keras
        save_hydra_keras(config["model"], variables,
                         str(out / KERAS_FILE))
    return 0


if __name__ == "__main__":
    sys.exit(main())
