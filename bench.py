"""Benchmark: flagship denoiser inference throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

The benched flagship (changed in round 3): ``unet_laplacian_v6_tpu`` —
the packaged TPU-tuned per-level width/kernel architecture
(w [2,3,3], k [3,5,5]; models/unet_laplacian.py). It replaces the v6
control as flagship on measured evidence, not assertion:
  * throughput: 1.30x the v6 control at 92% of its parameters
    (docs/PERF.md probe table; v6 control = 493 img/s bf16 b32 @256**2
    with this same methodology, recorded in BENCH_r02.json);
  * quality: trained from scratch with the identical recipe/data it
    beats the v6 control at EVERY sigma by ~5 MAE gray levels
    (docs/TRAINING_DEMO.md round 3b) and ships as the quality-gated
    pretrained artifact ``unet_laplacian_v6_tpu_scratch``
    (tests/test_pretrained.py::test_shipped_tpu_flagship_kitti_gate).
The baseline below stays the reference's OWN flagship (its
model_builder, unet_laplacian_v6 config) on this machine's CPU: the
reference builder only accepts scalar width/kernel_size
(/root/reference/bfcnn/backbone_unet_laplacian.py:38-41), so the
per-level variant does not exist there to measure.

Methodology (IMPORTANT — changed in round 2): K model applications are
chained inside ONE jitted program via lax.scan (each iteration consumes
the previous output) reduced to a scalar, and the wall time difference
between a K=30 and a K=10 program — each fetched with device_get, which
truly blocks — gives the per-batch compute time with constant overheads
cancelled. Plain dispatch-loop timing with block_until_ready is NOT valid
through this environment's TPU tunnel: block_until_ready returns before
remote execution completes, so such loops measure the ENQUEUE rate
(observed up to 1.45M "img/s", i.e. nonsense). Round-1 numbers recorded
that way (55,962 driver-captured; 77,980 in earlier docs) were enqueue
artifacts; the honest steady-state compute number on one v5e chip is
~400 img/s bf16 @256² — still >140x the measured TF-CPU baseline.

The reference publishes no throughput numbers (SURVEY §6); the baseline
below is the reference's OWN model (its model_builder, unet_laplacian_v6
config) measured on this machine's CPU.
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

BATCH = 32
K1, K2 = 10, 30


def _acquisition_watchdog(timeout_s: int = 900):
    """The axon TPU is single-tenant and its claim wait is UNBOUNDED: a
    stale server-side lease (e.g. from an uncleanly killed process) makes
    ``jax.devices()`` sleep-retry forever. Rather than hang the driver,
    print an honest one-line JSON error and exit once ``timeout_s``
    passes without device acquisition. The watchdog is disarmed the
    moment devices are acquired; compile time (1-7 min per cold program
    through the tunnel) is intentionally NOT bounded."""
    import os
    import threading

    acquired = threading.Event()

    def watch():
        if not acquired.wait(timeout_s):
            print(json.dumps({
                "metric": "unet_laplacian_v6_tpu_256px_inference",
                "value": None,
                "unit": "images/sec",
                "vs_baseline": None,
                "error": f"TPU not acquired within {timeout_s}s — the "
                         f"single-tenant axon claim is held elsewhere "
                         f"(stale lease?); rerun when the chip frees up",
            }), flush=True)
            os._exit(2)

    threading.Thread(target=watch, daemon=True).start()
    return acquired


def main():
    acquired = _acquisition_watchdog()
    import jax
    jax.devices()
    acquired.set()
    import jax.numpy as jnp
    from jax import lax
    import blind_image_denoising_tpu as bid
    from blind_image_denoising_tpu.models.hydra import model_builder

    cfg = bid.CONFIGS_DICT["unet_laplacian_v6_tpu"]
    # bfloat16 compute: MXU-native on TPU (measured 1.49x over f32 at b32
    # with honest timing); params stay f32
    results = model_builder(cfg["model"], dtype=jnp.bfloat16)
    hydra = results.hydra

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (BATCH, 256, 256, 3))
        .astype(np.float32))
    # init at a tiny spatial size: fully-convolutional param shapes are
    # size-independent and the small init compiles minutes faster cold
    variables = hydra.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 32, 32, 3), jnp.float32),
                           train=False)

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
    images_per_sec = BATCH / per_batch

    print(json.dumps({
        "metric": "unet_laplacian_v6_tpu_256px_inference",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
