"""Diagnose the fused path's end-to-end regression: per-variant timing +
XLA cost-analysis bytes. Run on the tunneled TPU."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 32
K1, K2 = 8, 20


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
    depth = int(cfg["backbone"].get("depth", 5))
    width = int(cfg["backbone"].get("width", 1))
    scales = {s: 0.05 for s in _stage_sites(range(min(2, depth - 1)), width)}

    def timed(f, *args, reps=4):
        float(f(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    def chain(fwd_single, k):
        def f(img):
            def body(c, _):
                return fwd_single(c).astype(jnp.float32), None
            y, _ = lax.scan(body, img, None, length=k)
            return y.sum()
        return jax.jit(f)

    def report(name, fwd_single):
        c1, c2 = chain(fwd_single, K1), chain(fwd_single, K2)
        t1, t2 = timed(c1, x), timed(c2, x)
        per = (t2 - t1) / (K2 - K1)
        ca = c2.lower(x).compile().cost_analysis()
        gb = ca.get("bytes accessed", float("nan")) / 1e9 / K2
        print(json.dumps({"mode": name,
                          "ms_per_batch": round(per * 1e3, 2),
                          "img_s": round(BATCH / per, 1),
                          "GB_per_batch": round(gb, 2)}), flush=True)

    report("hydra_bf16", lambda c: hydra.apply(variables, c,
                                               train=False)[0])

    fwd_xla, _ = build_fused_forward(cfg, variables, scales=None,
                                     fused_levels=())
    report("reimpl_all_xla_bf16", lambda c: fwd_xla(c)[0])

    fwd_l0, _ = build_fused_forward(cfg, variables, scales=scales,
                                    fused_levels=(0,))
    report("fused_int8_L0_only", lambda c: fwd_l0(c)[0])

    fwd_all, _ = build_fused_forward(cfg, variables, scales=scales)
    report("fused_int8_L0_L1", lambda c: fwd_all(c)[0])


if __name__ == "__main__":
    main()
