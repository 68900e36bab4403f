"""Benchmark: flagship denoiser (unet_laplacian_v6) inference throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

The reference publishes no throughput numbers (SURVEY §6); the driver
baseline (BASELINE.json) is TF-CPU-derived 256×256 images/sec. We measure
steady-state jitted forward throughput at batch 8, 256×256×3, on whatever
accelerator jax.devices() exposes (one TPU chip under the driver).
"""

import json
import time

import numpy as np


# MEASURED on this machine (2026-08-16): the reference's own model_builder
# (unet_laplacian_v6.json) under TF 2.21 + tf_keras legacy, CPU, tf.function
# graph, batch 8 @256²: 2.69 img/s (2979 ms/batch). With jit_compile=True
# (XLA-CPU, what the reference's DenoiserModule uses) it is far slower:
# 0.37 img/s. We quote the faster plain-graph number as the baseline.
BASELINE_IMAGES_PER_SEC = 2.69


def main():
    import jax
    import jax.numpy as jnp
    import blind_image_denoising_tpu as bid
    from blind_image_denoising_tpu.models.hydra import model_builder

    cfg = bid.CONFIGS_DICT["unet_laplacian_v6"]
    # bfloat16 compute: MXU-native on TPU (~2.1x over f32 measured on v5e);
    # params stay f32, activations/conv math run bf16
    results = model_builder(cfg["model"], dtype=jnp.bfloat16)
    hydra = results.hydra

    batch, hw = 8, 256
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (batch, hw, hw, 3))
        .astype(np.float32))
    # init at a tiny spatial size: fully-convolutional param shapes are
    # size-independent and the small init compiles minutes faster cold
    variables = hydra.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 32, 32, 3), jnp.float32),
                           train=False)

    fwd = jax.jit(lambda v, im: hydra.apply(v, im, train=False)[0])
    # warmup/compile
    jax.block_until_ready(fwd(variables, x))

    # timed steady state: keep the window ≥ ~2s — short windows are
    # dominated by dispatch jitter (observed 2x run-to-run swings at 20
    # iters through the TPU tunnel)
    iters = 50
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(variables, x)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        if dt > 2.0 or iters >= 3200:
            break
        iters *= 2

    images_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "unet_laplacian_v6_256px_inference",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
