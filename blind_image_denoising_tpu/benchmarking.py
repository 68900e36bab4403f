"""Honest TPU timing: multi-K scan-chain least-squares + roofline check.

Methodology (docs/PERF.md): dispatch-loop timings are invalid through
this environment's TPU tunnel — ``block_until_ready`` returns before
remote execution completes, so loops measure the ENQUEUE rate. The valid
measurement chains K applications of the unit under test inside ONE
jitted ``lax.scan`` reduced to a scalar and forces completion with a
``device_get`` read. Per-unit time is then the SLOPE of wall time vs K.

Round-5 hardening (VERDICT r4 #2): the round-4 two-point K-differencing
(min@K2 − min@K1) has no variance reporting and inflates arbitrarily
when the K1 minimum is load-biased high — BENCH_r04 recorded 1085 img/s
against the model's own ≈794 img/s HBM roofline. This module replaces it
with

* >= 3 K values, per-unit time = least-squares slope over the per-K
  MINIMUM times (host load only ever ADDS time, so the min is the
  estimator of the true device time; a slope over minima cannot be
  inflated by one bad point the way a two-point difference can);
* spread across repeats: the slope is also computed per repeat r over
  {(K, t_rK)} — the reported interval is the min..max of those slopes;
* a fit-quality R^2 on the min-time fit (nonlinearity = something other
  than steady-state compute is being measured);
* an HBM-roofline cross-check from the XLA cost analysis of the
  single-application executable: measurements above 110% of
  bandwidth / bytes are flagged as measurement errors, not reported as
  wins.
"""

import time
from typing import Callable, Dict, Sequence

import numpy as np

# v5e: 819 GB/s HBM bandwidth (docs/PERF.md roofline analysis)
V5E_HBM_BYTES_PER_S = 819e9
# measurements above this fraction of the byte roofline are flagged
ROOFLINE_TOLERANCE = 1.10

DEFAULT_K_VALUES = (5, 15, 30)


def lstsq_slope(ks: Sequence[float], ts: Sequence[float]):
    """Least-squares fit t = a + b*k -> (slope b, intercept a, R^2)."""
    k = np.asarray(ks, np.float64)
    t = np.asarray(ts, np.float64)
    b, a = np.polyfit(k, t, 1)
    pred = a + b * k
    ss_res = float(((t - pred) ** 2).sum())
    ss_tot = float(((t - t.mean()) ** 2).sum())
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 1.0
    return float(b), float(a), r2


def time_chain_slope(make_chain: Callable[[int], Callable],
                     args: tuple,
                     k_values: Sequence[int] = DEFAULT_K_VALUES,
                     reps: int = 5) -> Dict:
    """Per-unit wall time of the chained program, with spread.

    ``make_chain(k)`` must return a jitted callable whose result is a
    scalar (so ``float(...)`` is a true ``device_get`` barrier) and whose
    cost is k chained applications of the unit under test.

    Returns {"unit_s", "slope_spread_s", "r2", "times"}:
    * unit_s: least-squares slope over per-K minimum times;
    * slope_spread_s: [min, max] over per-repeat slopes (repeat r pairs
      its r-th sample at every K);
    * times: per-K list of all repeat times (seconds), for the record.
    """
    if len(k_values) < 3:
        raise ValueError(f"need >= 3 K values, got {k_values!r}")
    if reps < 3:
        raise ValueError(f"need >= 3 repeats, got {reps}")
    ks = sorted(int(k) for k in k_values)
    times = {}
    for k in ks:
        fn = make_chain(k)
        float(fn(*args))  # compile + warm
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))  # device_get: truly blocks
            samples.append(time.perf_counter() - t0)
        times[k] = samples
    mins = [min(times[k]) for k in ks]
    slope, _, r2 = lstsq_slope(ks, mins)
    rep_slopes = [lstsq_slope(ks, [times[k][r] for k in ks])[0]
                  for r in range(reps)]
    return {
        "unit_s": slope,
        "slope_spread_s": [float(min(rep_slopes)), float(max(rep_slopes))],
        "r2": r2,
        "times": {k: [round(t, 4) for t in v] for k, v in times.items()},
    }


def cost_bytes(jitted: Callable, *args) -> float:
    """HBM bytes accessed by one execution, from XLA cost analysis."""
    cost = jitted.lower(*args).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("bytes accessed", 0.0))


def roofline_check(measured_unit_s: float, bytes_per_unit: float,
                   bw_bytes_per_s: float = V5E_HBM_BYTES_PER_S) -> Dict:
    """Cross-check a measured per-unit time against the byte roofline.

    Returns {"roofline_unit_s", "fraction_of_roofline", "ok"}; ok=False
    means the measurement claims to beat the memory system by >10% — a
    measurement error by this model's own analysis (docs/PERF.md: both
    inference and training run AT the HBM limit)."""
    floor = bytes_per_unit / bw_bytes_per_s
    frac = floor / measured_unit_s if measured_unit_s > 0 else float("inf")
    return {
        "roofline_unit_s": floor,
        "fraction_of_roofline": frac,
        "ok": bool(frac <= ROOFLINE_TOLERANCE),
    }
