"""End-to-end TPU benchmark: flagship (unet_laplacian_v6) inference —
standard bf16 hydra vs the fused int8 forward (inference/fused.py).

Honest scan-chain K-differenced methodology (bench.py). Run on the
tunneled TPU:  python scripts/bench_fused_e2e.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 32
K1, K2 = 10, 30


def timed(f, *args, reps=5):
    float(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import blind_image_denoising_tpu as bid
    from blind_image_denoising_tpu.models.hydra import model_builder
    from blind_image_denoising_tpu.inference.fused import (
        build_fused_forward, _stage_sites)

    print("devices:", jax.devices(), flush=True)
    cfg = bid.CONFIGS_DICT["unet_laplacian_v6"]["model"]
    results = model_builder(cfg, dtype=jnp.bfloat16)
    hydra = results.hydra
    variables = hydra.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 32, 32, 3), jnp.float32),
                           train=False)
    variables = {k: v for k, v in variables.items()
                 if k in ("params", "batch_stats")}

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (BATCH, 256, 256, 3))
        .astype(np.float32))

    # --- baseline: standard bf16 hydra
    def make_chain_hydra(k):
        def chain(v, img):
            def body(c, _):
                return (hydra.apply(v, c, train=False)[0]
                        .astype(jnp.float32), None)
            y, _ = lax.scan(body, img, None, length=k)
            return y.sum()
        return jax.jit(chain)

    t1 = timed(make_chain_hydra(K1), variables, x)
    t2 = timed(make_chain_hydra(K2), variables, x)
    per_batch_bf16 = (t2 - t1) / (K2 - K1)
    print(json.dumps({"mode": "hydra_bf16",
                      "ms_per_batch": round(per_batch_bf16 * 1e3, 2),
                      "img_s": round(BATCH / per_batch_bf16, 1)}), flush=True)

    # --- fused int8 path (fixed representative scales; throughput is
    # scale-independent)
    depth = int(cfg["backbone"].get("depth", 5))
    width = int(cfg["backbone"].get("width", 1))
    scales = {s: 0.05 for s in _stage_sites(range(min(2, depth - 1)), width)}
    fwd, _ = build_fused_forward(cfg, variables, scales=scales)

    def make_chain_fused(k):
        def chain(img):
            def body(c, _):
                return fwd(c)[0].astype(jnp.float32), None
            y, _ = lax.scan(body, img, None, length=k)
            return y.sum()
        return jax.jit(chain)

    t1 = timed(make_chain_fused(K1), x)
    t2 = timed(make_chain_fused(K2), x)
    per_batch_fused = (t2 - t1) / (K2 - K1)
    print(json.dumps({"mode": "fused_int8",
                      "ms_per_batch": round(per_batch_fused * 1e3, 2),
                      "img_s": round(BATCH / per_batch_fused, 1),
                      "speedup_vs_bf16":
                          round(per_batch_bf16 / per_batch_fused, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
