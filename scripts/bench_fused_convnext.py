"""TPU microbenchmark: fused int8 ConvNext block vs the XLA bf16 chain.

Honest methodology (bench.py): K iterations chained inside one jitted
lax.scan reduced to a scalar, device_get-forced, K-differenced.

Run on the tunneled TPU:  python scripts/bench_fused_convnext.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timed(f, *args, reps=5):
    import jax
    float(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_shape(B, C, E, H, W, K1=8, K2=24):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from blind_image_denoising_tpu.ops.pallas_convnext import (
        fused_convnext_block, to_cf_padded, quantize_cf)

    rng = np.random.default_rng(0)
    weights = dict(
        dw_w=jnp.asarray(rng.normal(0, 0.05, (C, 25)), jnp.float32),
        ln_scale=jnp.asarray(rng.uniform(0.5, 1.5, (C, 1)), jnp.float32),
        w2=jnp.asarray(rng.normal(0, 0.2, (E, C)), jnp.float32),
        w3=jnp.asarray(rng.normal(0, 0.2, (C, E)), jnp.float32),
        gamma_gain=jnp.asarray(rng.uniform(0.3, 0.9, (C, 1)), jnp.float32),
    )
    x = jnp.asarray(rng.normal(0, 1.0, (B, H, W, C)), jnp.float32)

    # --- fused int8 kernel, chained (int8 out feeds int8 in)
    xq = quantize_cf(to_cf_padded(x, 2), 1.0 / 32)

    def chain_fused(k):
        def f(xq):
            def body(c, _):
                return fused_convnext_block(
                    c, **weights, H=H, W=W, pad=2,
                    scale_in=1.0 / 32, scale_out=1.0 / 32), None
            y, _ = lax.scan(body, xq, None, length=k)
            return y.astype(jnp.float32).sum()
        return jax.jit(f)

    t1 = timed(chain_fused(K1), xq)
    t2 = timed(chain_fused(K2), xq)
    fused_ms = (t2 - t1) / (K2 - K1) * 1e3

    # --- XLA bf16 equivalent of the same block math, chained
    wb = {k: v.astype(jnp.bfloat16) for k, v in weights.items()}
    ln_f32 = weights["ln_scale"].reshape(C)

    def xla_block(xb):
        dw = wb["dw_w"].T.reshape(5, 5, 1, C)
        y = lax.conv_general_dilated(
            xb, dw, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
        t = ((y - mean.astype(jnp.bfloat16))
             * lax.rsqrt(var + 1e-3).astype(jnp.bfloat16)
             * ln_f32.astype(jnp.bfloat16))
        h = jnp.einsum("bhwc,ec->bhwe", t, wb["w2"])
        h = jnp.where(h >= 0, h, h * jnp.bfloat16(0.1))
        p = jnp.einsum("bhwe,ce->bhwc", h, wb["w3"])
        return xb + wb["gamma_gain"].reshape(C) * p

    def chain_xla(k):
        def f(xb):
            def body(c, _):
                return xla_block(c), None
            y, _ = lax.scan(body, xb.astype(jnp.bfloat16), None, length=k)
            return y.astype(jnp.float32).sum()
        return jax.jit(f)

    t1 = timed(chain_xla(K1), x)
    t2 = timed(chain_xla(K2), x)
    xla_ms = (t2 - t1) / (K2 - K1) * 1e3

    return {"shape": f"B{B} C{C} E{E} {H}x{W}",
            "fused_int8_ms": round(fused_ms, 3),
            "xla_bf16_ms": round(xla_ms, 3),
            "speedup": round(xla_ms / fused_ms, 2)}


def main():
    import jax
    print("devices:", jax.devices())
    for (B, C, E, H, W) in [(32, 32, 128, 256, 256),
                            (32, 64, 256, 128, 128)]:
        r = bench_shape(B, C, E, H, W)
        print(json.dumps(r), flush=True)


if __name__ == "__main__" and "--ablate" not in sys.argv:
    main()


def ablate():
    """Attribution: time the L0 shape with kernel stages skipped.

    Requires the kernel module to expose an _ABLATE set (the shipping
    kernel dropped it after the attribution campaign concluded — see
    docs/QUANTIZATION.md round-3 findings); kept for re-running the
    methodology against future kernel revisions."""
    import blind_image_denoising_tpu.ops.pallas_convnext as pc
    if not hasattr(pc, "_ABLATE"):
        print("kernel has no _ABLATE hook — re-add it to attribute stages")
        return
    for ab in [set(), {"dw"}, {"ln"}, {"matmul"}, {"edges"},
               {"dw", "ln", "matmul", "edges"}]:
        pc._ABLATE.clear()
        pc._ABLATE.update(ab)
        # new ablation set -> force a fresh jit cache entry
        pc.fused_convnext_block._clear_cache()
        r = bench_shape(32, 32, 128, 256, 256)
        print(json.dumps({"ablate": sorted(ab) or ["none"],
                          "fused_ms": r["fused_int8_ms"]}), flush=True)
    pc._ABLATE.clear()


if __name__ == "__main__" and "--ablate" in sys.argv:
    import jax
    ablate()
