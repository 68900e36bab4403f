"""Serving-path benchmark: BatchingDenoiser throughput + latency on TPU.

Measures the packaged pretrained model through the batching frontend
(serving.py): per-request latency (p50/p99) and aggregate throughput at
concurrency {1, 8, 32}, mixed-shape traffic behavior, and batch
formation vs max_wait_ms. Caller-side timing is honest here: each
request blocks on np.asarray(denoiser(batch)) — a device_get — so unlike
dispatch loops it measures completed work.

Run on the tunneled TPU:  python scripts/bench_serving.py
"""

import json
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SHAPE = (256, 256, 3)
ALT_SHAPE = (128, 256, 3)


def drive(batcher, n_threads: int, seconds: float, shapes):
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 256, s, dtype=np.uint8) for s in shapes]
    latencies = []
    lock = threading.Lock()
    stop = time.monotonic() + seconds

    def worker(i):
        local = []
        k = 0
        while time.monotonic() < stop:
            img = images[(i + k) % len(images)]
            t0 = time.perf_counter()
            out = batcher(img)
            local.append(time.perf_counter() - t0)
            assert out.shape == img.shape
            k += 1
        with lock:
            latencies.extend(local)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(n_threads)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    lat = np.asarray(sorted(latencies))
    return {
        "requests": len(lat),
        "throughput_img_s": round(len(lat) / wall, 1),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 1),
    }


def main():
    import jax
    import blind_image_denoising_tpu as bid
    from blind_image_denoising_tpu.serving import BatchingDenoiser

    print("devices:", jax.devices(), flush=True)
    model = sys.argv[1] if len(sys.argv) > 1 else "unet_laplacian_v56_highnoise"
    # optional dtype override (argv[2]); default honors the artifact's
    # own tpu.compute_dtype (pipeline.json)
    dtype = sys.argv[2] if len(sys.argv) > 2 else None
    den = bid.load_model(model, dtype=dtype)

    # warm every batch bucket of both shapes (the startup cost a real
    # server pays via --warm-shape; without it the first request at each
    # new batch size eats an XLA compile — measured as multi-second p99
    # spikes, docs/SERVING.md)
    warmer = BatchingDenoiser(den, max_batch=32)
    for s in (SHAPE, ALT_SHAPE):
        warmer.warm(s)
    warmer.close()
    print("warmup done", flush=True)

    results = {"model": model, "dtype": dtype or "artifact"}
    for conc in (1, 8, 32):
        batcher = BatchingDenoiser(den, max_batch=32, max_wait_ms=5.0)
        r = drive(batcher, conc, 20.0, [SHAPE])
        batcher.close()
        results[f"conc_{conc}"] = r
        print(json.dumps({f"conc_{conc}": r}), flush=True)

    # mixed-shape traffic: alternating buckets must still batch same-shape
    batcher = BatchingDenoiser(den, max_batch=32, max_wait_ms=5.0)
    r = drive(batcher, 16, 20.0, [SHAPE, ALT_SHAPE])
    batcher.close()
    results["mixed_conc_16"] = r
    print(json.dumps({"mixed_conc_16": r}), flush=True)

    # batch-formation sweep at high concurrency
    for wait in (1.0, 5.0, 20.0):
        batcher = BatchingDenoiser(den, max_batch=32, max_wait_ms=wait)
        r = drive(batcher, 32, 15.0, [SHAPE])
        batcher.close()
        results[f"wait_{wait}ms"] = r
        print(json.dumps({f"wait_{wait}ms": r}), flush=True)

    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
