"""Architectural VPU-reduction probe: flagship config variants, measured
with the scan-chain multi-K LEAST-SQUARES-SLOPE methodology
(blind_image_denoising_tpu/benchmarking.py — dispatch loops lie through
the TPU tunnel, and two-point K-differencing can inflate, VERDICT r4 #2;
every row is roofline-checked against its own XLA byte count).

The flagship (unet_laplacian_v6) is VPU-elementwise-bound concurrently
with ~80% HBM utilization (docs/PERF.md, docs/QUANTIZATION.md): the
remaining single-chip levers are ARCHITECTURAL — depthwise tap count and
channel width — not scheduling. This probe measures what each structural
delta buys on real hardware, with untrained params (speed is
weight-independent for a fixed graph).

Run: python scripts/probe_arch_variants.py   (holds the TPU; single-tenant)
"""

import copy
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 32
K_VALUES = (5, 15, 30)
SIZE = 256


def measure(cfg_model, label):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from blind_image_denoising_tpu.models.hydra import model_builder

    results = model_builder(cfg_model, dtype=jnp.bfloat16)
    hydra = results.hydra

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (BATCH, SIZE, SIZE, 3))
        .astype(np.float32))
    variables = hydra.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 32, 32, 3), jnp.float32),
                           train=False)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(variables["params"]))

    def make_chain(k):
        def chain(v, img):
            def body(c, _):
                return (hydra.apply(v, c, train=False)[0]
                        .astype(jnp.float32), None)
            y, _ = lax.scan(body, img, None, length=k)
            return y.sum()
        return jax.jit(chain)

    from blind_image_denoising_tpu import benchmarking as bm
    result = bm.time_chain_slope(make_chain, (variables, x),
                                 k_values=K_VALUES, reps=5)
    per_batch = result["unit_s"]
    ips = BATCH / per_batch

    # byte/flop profile of the single-apply executable
    fn = jax.jit(lambda v, i: hydra.apply(v, i, train=False)[0])
    cost = fn.lower(variables, x).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    gb = cost.get("bytes accessed", 0) / 1e9
    gflop = cost.get("flops", 0) / 1e9
    roof = bm.roofline_check(per_batch, gb * 1e9)

    lo, hi = result["slope_spread_s"]
    row = {"label": label, "img_per_s": round(ips, 1),
           "img_per_s_spread": [round(BATCH / hi, 1), round(BATCH / lo, 1)],
           "r2": round(result["r2"], 5),
           "ms_per_batch": round(per_batch * 1e3, 2),
           "roofline_img_per_s": round(BATCH / roof["roofline_unit_s"], 1),
           "roofline_ok": roof["ok"],
           "params": n_params, "GB": round(gb, 2), "GFLOP": round(gflop, 1)}
    print(json.dumps(row), flush=True)
    return row


def main():
    import blind_image_denoising_tpu as bid

    base = copy.deepcopy(bid.CONFIGS_DICT["unet_laplacian_v6"]["model"])

    variants = [("v6 control (dw5x5)", {})]
    if "--mxu" in sys.argv:
        # round 4 of the probe (VERDICT r3 #3): the INVERSE of trimming —
        # raise arithmetic intensity toward the MXU ridge point. Base =
        # the shipped TPU flagship (w[2,3,3] k[3,5,5]); levers: wider
        # channels (C0 in {64, 128}) and the space-to-depth stem (full-
        # res work at H/2 with 4x channels — same pixels, 4x intensity).
        base = copy.deepcopy(bid.CONFIGS_DICT["unet_laplacian_v6_tpu"]["model"])
        variants = [
            ("v6_tpu control (C32)", {}),
            ("C64", {"filters": 64}),
            ("C128", {"filters": 128}),
            ("s2d2 C32", {"space_to_depth_stem": 2}),
            ("s2d2 C64", {"space_to_depth_stem": 2, "filters": 64}),
            ("s2d2 C128", {"space_to_depth_stem": 2, "filters": 128}),
            ("s2d2 C64 w3", {"space_to_depth_stem": 2, "filters": 64,
                             "width": [3, 3, 3],
                             "encoder_kernel_size": [5, 5, 5],
                             "decoder_kernel_size": [5, 5, 5]}),
        ]
    elif "--perlevel" in sys.argv:
        # round 2 of the probe: per-level width/taps — the full-res level
        # dominates bytes AND VPU work, so go lean there and keep the coarse
        # levels at full capacity (uses the per-level list config extension)
        variants += [
            ("w[2,3,3] k[3,5,5]", {"width": [2, 3, 3],
                                    "encoder_kernel_size": [3, 5, 5],
                                    "decoder_kernel_size": [3, 5, 5]}),
            ("w[2,3,3] k5", {"width": [2, 3, 3]}),
            ("w[1,3,3] k[3,5,5]", {"width": [1, 3, 3],
                                    "encoder_kernel_size": [3, 5, 5],
                                    "decoder_kernel_size": [3, 5, 5]}),
            ("w[2,2,3] k[3,3,5]", {"width": [2, 2, 3],
                                    "encoder_kernel_size": [3, 3, 5],
                                    "decoder_kernel_size": [3, 3, 5]}),
        ]
    else:
        variants.append(("dw3x3 enc+dec", {"encoder_kernel_size": 3,
                                            "decoder_kernel_size": 3}))
        variants.append(("dw3x3 dec only", {"decoder_kernel_size": 3}))
        # width: fewer blocks per level (width 3 -> 2) — structural VPU cut
        variants.append(("width 2 (dw5x5)", {"width": 2}))
        variants.append(("dw3x3 + width 2", {"encoder_kernel_size": 3,
                                              "decoder_kernel_size": 3,
                                              "width": 2}))

    rows = []
    for label, deltas in variants:
        cfg = copy.deepcopy(base)
        cfg["backbone"].update(deltas)
        rows.append(measure(cfg, label))

    ctrl = rows[0]["img_per_s"]
    print("\n== summary (vs control) ==")
    for r in rows:
        print(f"{r['label']:>22}: {r['img_per_s']:7.1f} img/s "
              f"({r['img_per_s']/ctrl:5.2f}x)  {r['GB']:.2f} GB  "
              f"{r['GFLOP']:.0f} GFLOP  {r['params']/1e3:.0f}k params")


if __name__ == "__main__":
    main()
