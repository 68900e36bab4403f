"""Pallas TPU kernel: fused noise corruption.

The training pipeline's corruption pass (ops/noise.py — per-sample
multiplicative + additive truncated-normal noise + rounding, the on-device
re-design of reference dataset.py:161-238) is HBM-bandwidth-bound
elementwise work. The jnp path costs several HBM round-trips (uniform
draws, two truncated-normal fields via inverse-CDF erfinv — an expensive
transcendental chain — then masking and rounding). This kernel does the
whole corruption in ONE pass: each (sample, row-tile) grid cell seeds the
on-core PRNG, draws its pixels' noise with Box-Muller, applies per-sample
flags/stds (derived from a sample-keyed seed so every tile of a sample
agrees), and writes the corrupted tile — one HBM read + one write total.

Truncation semantics: tf.random.truncated_normal re-draws until |z| ≤ 2σ.
Here we redraw once and clip the ~0.2% of mass still outside — a
documented approximation (exact parity path = ops/noise.py, which stays
the default; enable this with ``tpu.pallas_noise`` in the config or
``use_pallas=True``).

MEASURED VERDICT (2026-08-16, honest chained timing with device_get —
the tunnel's block_until_ready returns early, see ops/pallas_pyramid.py):
end-to-end flagship train step at 128²b16 is unchanged with the kernel
on (f32: 51.4 vs 51.9 ms; bf16: 33.7 vs 33.8 ms) — the corruption pass
is a negligible slice of the step, so any round-1 speedup claim for this
kernel is retracted; it remains a documented-approximation option only.
"""

from functools import partial
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 2.0 * np.pi


def _bits_to_uniform(bits):
    """uint32 → float32 uniform in (0, 1): set exponent to 127, mantissa
    from the bits → [1, 2), subtract 1."""
    mantissa = jnp.right_shift(bits, jnp.uint32(9))
    f = pltpu.bitcast(jnp.bitwise_or(mantissa, jnp.uint32(0x3F800000)),
                      jnp.float32)
    return f - 1.0


def _gaussian_pair(shape):
    """Two independent standard-normal fields via Box-Muller."""
    u1 = _bits_to_uniform(pltpu.bitcast(pltpu.prng_random_bits(shape),
                                        jnp.uint32))
    u2 = _bits_to_uniform(pltpu.bitcast(pltpu.prng_random_bits(shape),
                                        jnp.uint32))
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
    return r * jnp.cos(_TWO_PI * u2), r * jnp.sin(_TWO_PI * u2)


def _truncated_normal(shape):
    """Approximate ±2σ truncated standard normal: redraw once, then clip."""
    z0, z1 = _gaussian_pair(shape)
    z = jnp.where(jnp.abs(z0) <= 2.0, z0, z1)
    return jnp.clip(z, -2.0, 2.0)


def _corrupt_kernel(seed_ref, x_ref, out_ref, *,
                    mul_lo, mul_hi, add_lo, add_hi, round_values,
                    use_mul, use_add):
    b = pl.program_id(0)       # sample index
    t = pl.program_id(1)       # row-tile index
    base_seed = seed_ref[0]

    # --- per-SAMPLE decisions: seed keyed by sample only, so every row
    # tile of the same sample derives identical flags/stds
    pltpu.prng_seed(base_seed + b * jnp.int32(7919))
    head = pltpu.bitcast(pltpu.prng_random_bits((8, 128)), jnp.uint32)
    u = _bits_to_uniform(head)
    mul_on = u[0, 0] > 0.5
    mul_std = mul_lo + u[0, 1] * (mul_hi - mul_lo)
    add_on = u[0, 2] > 0.5
    add_std = add_lo + u[0, 3] * (add_hi - add_lo)

    # --- per-PIXEL noise: reseed keyed by (sample, tile)
    pltpu.prng_seed(base_seed + b * jnp.int32(7919)
                    + (t + 1) * jnp.int32(104729))
    x = x_ref[...]
    shape = x.shape

    y = x
    if use_mul:
        noise = 1.0 + mul_std * _truncated_normal(shape)
        y = jnp.where(mul_on, y * noise, y)
    if use_add:
        noise = add_std * _truncated_normal(shape)
        y = jnp.where(add_on, y + noise, y)
    if round_values:
        y = jnp.round(y)
    out_ref[...] = y


def corrupt_batch_pallas(
        seed,
        batch: jnp.ndarray,
        additive_noise: Optional[Sequence[float]] = None,
        multiplicative_noise: Optional[Sequence[float]] = None,
        round_values: bool = True,
        row_tile: int = 64,
        interpret: bool = False) -> jnp.ndarray:
    """Fused corruption of a float32 [B, H, W, C] batch in [0, 255].

    ``seed``: int32 scalar (fold the train-step PRNGKey into it).
    Semantics match ops.noise.corrupt_batch up to the documented
    truncation approximation and RNG stream."""
    b, h, w, c = batch.shape
    use_add = additive_noise is not None and len(additive_noise) > 0
    use_mul = multiplicative_noise is not None and len(multiplicative_noise) > 0
    if not (use_add or use_mul):
        return jnp.round(batch) if round_values else batch

    mul_lo = float(min(multiplicative_noise)) if use_mul else 0.0
    mul_hi = float(max(multiplicative_noise)) if use_mul else 0.0
    add_lo = float(min(additive_noise)) if use_add else 0.0
    add_hi = float(max(additive_noise)) if use_add else 0.0

    row_tile = min(row_tile, h)
    while h % row_tile != 0:
        row_tile //= 2
    row_tile = max(1, row_tile)
    grid = (b, h // row_tile)

    kernel = partial(
        _corrupt_kernel,
        mul_lo=mul_lo, mul_hi=mul_hi, add_lo=add_lo, add_hi=add_hi,
        round_values=round_values, use_mul=use_mul, use_add=use_add)

    seed_arr = jnp.asarray(seed, jnp.int32).reshape((1,))

    # Lay the image out as [B, H, W·C] so the last (lane) dimension is a
    # multiple of 128 instead of C=3 — otherwise every 3-wide channel slot
    # pads to 128 lanes and the block overflows VMEM 42× over.
    flat = batch.reshape(b, h, w * c)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, row_tile, w * c),
                         lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, row_tile, w * c),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
        interpret=interpret,
    )(seed_arr, flat)
    return out.reshape(b, h, w, c)
