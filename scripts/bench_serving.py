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


def decompose(den, batch: int = 32, reps: int = 8):
    """Where does a serving batch's wall time go (VERDICT r4 #6)?

    * sync_batch_ms: one synchronous den(batch) — upload + compute +
      download + host, all in series (the round-4 batcher's unit cost);
    * pipelined_ms: the same work with a 2-deep dispatch/force pipeline
      (the round-5 batcher's unit cost) — the difference is the tunnel/
      host time the pipeline hides;
    * host_stack_ms: forming the batch on host (np.stack + pad), the
      only part that cannot overlap a caller's own request.
    """
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (batch,) + SHAPE, dtype=np.uint8)
    den(x)  # compile + warm

    t0 = time.perf_counter()
    for _ in range(reps):
        den(x)
    sync_ms = (time.perf_counter() - t0) / reps * 1e3

    # 2-deep software pipeline over the dispatch/force seam
    t0 = time.perf_counter()
    pending = [den.dispatch(x), den.dispatch(x)]
    for _ in range(reps - 2):
        np.asarray(pending.pop(0))
        pending.append(den.dispatch(x))
    for p in pending:
        np.asarray(p)
    pipe_ms = (time.perf_counter() - t0) / reps * 1e3

    imgs = [x[i] for i in range(batch)]
    t0 = time.perf_counter()
    for _ in range(reps):
        np.stack(imgs, axis=0)
    stack_ms = (time.perf_counter() - t0) / reps * 1e3

    return {"sync_batch_ms": round(sync_ms, 1),
            "pipelined_ms": round(pipe_ms, 1),
            "host_stack_ms": round(stack_ms, 2),
            "sync_img_s": round(batch / (sync_ms / 1e3), 1),
            "pipelined_img_s": round(batch / (pipe_ms / 1e3), 1)}


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

    # where a batch's wall time goes (sync vs pipelined vs host)
    results["decompose_b32"] = decompose(den)
    print(json.dumps({"decompose_b32": results["decompose_b32"]}),
          flush=True)

    for conc in (1, 8, 32):
        batcher = BatchingDenoiser(den, max_batch=32, max_wait_ms=5.0)
        r = drive(batcher, conc, 20.0, [SHAPE])
        batcher.close()
        results[f"conc_{conc}"] = r
        print(json.dumps({f"conc_{conc}": r}), flush=True)

    # pipeline-depth sweep at full concurrency (depth 1 = the round-4
    # synchronous behavior minus its collect stall)
    for depth in (1, 2, 4):
        batcher = BatchingDenoiser(den, max_batch=32, max_wait_ms=5.0,
                                   pipeline_depth=depth)
        r = drive(batcher, 32, 15.0, [SHAPE])
        batcher.close()
        results[f"depth_{depth}"] = r
        print(json.dumps({f"depth_{depth}": r}), flush=True)

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
