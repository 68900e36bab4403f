"""Prove the product surface reaches the bench ceiling (VERDICT r3 #1).

bench.py measures a hand-built bf16 flagship; this script measures the
MODEL A USER GETS from ``load_model("unet_laplacian_v6_tpu_scratch")``
(which now serves the artifact's trained compute dtype by default) with
the identical scan-chain K-differencing methodology. Pass a dtype
override as argv[2] to quantify the f32 cost on the same weights.

Run on the tunneled TPU:  python scripts/bench_load_model.py [model] [dtype]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 32
K1, K2 = 10, 30


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import blind_image_denoising_tpu as bid

    model_name = sys.argv[1] if len(sys.argv) > 1 else \
        "unet_laplacian_v6_tpu_scratch"
    dtype = sys.argv[2] if len(sys.argv) > 2 else None
    den = bid.load_model(model_name, dtype=dtype)
    hydra, variables = den.model, den.variables

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (BATCH, 256, 256, 3))
        .astype(np.float32))

    def make_chain(k):
        def chain(v, img):
            def body(c, _):
                return (hydra.apply(v, c, train=False)[0]
                        .astype(jnp.float32), None)
            y, _ = lax.scan(body, img, None, length=k)
            return y.sum()
        return jax.jit(chain)

    def timed(f, reps=5):
        float(f(variables, x))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(variables, x))  # device_get: truly blocks
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(make_chain(K1))
    t2 = timed(make_chain(K2))
    per_batch = (t2 - t1) / (K2 - K1)
    print(json.dumps({
        "model": model_name, "dtype": dtype or "artifact(default)",
        "img_per_s": round(BATCH / per_batch, 1),
        "ms_per_batch": round(per_batch * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
