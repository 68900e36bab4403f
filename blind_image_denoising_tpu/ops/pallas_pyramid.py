"""Pallas TPU kernel: fused Laplacian band-split.

The Laplacian decomposition at the heart of the pyramid ops and the
unet_laplacian encoder (ops/pyramid.py laplacian_pyramid;
models/unet_laplacian.py encoder) does, per level:

    smooth = avg_pool_kxk_stride1(x)     (count-aware SAME)
    band   = x - smooth                  (high-frequency skip)
    down   = smooth[:, ::2, ::2, :]      (low-frequency continue)

As separate XLA ops this costs multiple HBM round-trips; the kernel fuses
the pooling (k² shifted adds in VMEM), subtraction and row decimation into
one pass per row tile. The border-count reciprocal (SAME pooling divides by
the number of in-image taps) is precomputed host-side and broadcast — it
only depends on (H, W, k), not on the data.

Layout: images run as [H, W·C] so the lane dimension is 128-aligned.
Row tiles of 32 keep each cell's working set ≈ a few MB of VMEM; the k−1
halo rows are re-read via overlapping input windows expressed as a second
tiled view of the same operand shifted by the pad.

MEASURED VERDICT (2026-08-16, v5e via the axon tunnel): wired into the
flagship unet_laplacian encoder (use_pallas_pyramid), the fused kernel is
8-11% SLOWER end-to-end than the plain-XLA composition (bf16 b8 @256²:
392 img/s XLA vs 362 Pallas; b32: 405 vs 367; f32 b32: 271 vs 242) —
XLA fuses the subtract into the consuming convs so only `smooth` costs
HBM, while the kernel materializes both outputs. An earlier "2.6x over
XLA" claim came from dispatch-loop timing, which on this tunnel measures
ENQUEUE rate (block_until_ready returns before execution completes) —
it is retracted; only device_get-forced, K-differenced timings are
trustworthy here (see bench.py). The kernels stay available (forward
parity exact, custom-VJP training-correct) for memory-bound
compositions where no consuming op can absorb the subtract.
"""

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _inv_den(h: int, w: int, k: int) -> np.ndarray:
    """Reciprocal of the SAME-padding valid-tap count, [H, W]."""
    pad = (k - 1) // 2
    ones = np.pad(np.ones((h, w), np.float32),
                  ((pad, k - 1 - pad), (pad, k - 1 - pad)))
    den = np.zeros((h, w), np.float32)
    for dy in range(k):
        for dx in range(k):
            den += ones[dy:dy + h, dx:dx + w]
    return (1.0 / den).astype(np.float32)


def _band_split_kernel(xpad_ref, inv_ref, band_ref, down_ref, *,
                       k, h, wc, w, c, row_tile):
    # xpad_ref: [1, H + k - 1, W·C] — rows pre-padded host-side so every
    # halo'd tile read is in-bounds; ref-level pl.ds reads are the
    # Mosaic-supported dynamic access
    t = pl.program_id(1)
    pad = (k - 1) // 2
    start = t * row_tile

    slab = xpad_ref[0, pl.ds(start, row_tile + k - 1), :]
    cols = jnp.pad(slab, ((0, 0), (pad * c, (k - 1 - pad) * c)))
    num = jnp.zeros((row_tile, wc), slab.dtype)
    for dy in range(k):          # static unrolled shifts
        for dx in range(k):
            num = num + cols[dy:dy + row_tile, dx * c:dx * c + wc]
    smooth = num * inv_ref[0]

    x_tile = xpad_ref[0, pl.ds(start + pad, row_tile), :]
    band_ref[0] = x_tile - smooth
    # row 2× decimation (reshape + static index; no strided gather)
    down_ref[0] = smooth.reshape(row_tile // 2, 2, wc)[:, 0, :]


def laplacian_band_split_pallas(
        x: jnp.ndarray, kernel_size: int = 2,
        row_tile: int = 32,
        interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, H, W, C] → (band [B,H,W,C], down [B,H/2,W/2,C]).

    Matches ops.pyramid's avg_pool_same(k, stride 1) + subtract +
    strided 2× downsample composition. H and W must be even."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError("H and W must be even for the 2x downsample")
    k = int(kernel_size)
    row_tile = min(row_tile, h)
    while h % row_tile or row_tile % 2:
        row_tile //= 2
    row_tile = max(2, row_tile)

    pad = (k - 1) // 2
    flat = x.reshape(b, h, w * c)
    flat_padded = jnp.pad(flat, ((0, 0), (pad, k - 1 - pad), (0, 0)))
    # per-tile inv-den block: same for every tile EXCEPT border tiles; keep
    # full rows and index per tile
    inv = jnp.repeat(jnp.asarray(_inv_den(h, w, k))[:, :, None],
                     c, axis=-1).reshape(1, h, w * c).astype(x.dtype)

    kernel = partial(_band_split_kernel, k=k, h=h, wc=w * c, w=w, c=c,
                     row_tile=row_tile)

    band, rows = pl.pallas_call(
        kernel,
        grid=(b, h // row_tile),
        in_specs=[
            pl.BlockSpec((1, h + k - 1, w * c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row_tile, w * c), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, row_tile, w * c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row_tile // 2, w * c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w * c), x.dtype),
            jax.ShapeDtypeStruct((b, h // 2, w * c), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flat_padded, inv)
    down = rows.reshape(b, h // 2, w, c)[:, :, ::2, :]
    return band.reshape(b, h, w, c), down


def laplacian_band_split_reference(x: jnp.ndarray, kernel_size: int = 2):
    """The plain-XLA composition (for parity tests and non-TPU fallback)."""
    from .resize import avg_pool_same
    smooth = avg_pool_same(x, (kernel_size, kernel_size), (1, 1))
    return x - smooth, smooth[:, ::2, ::2, :]


def _band_smooth_kernel(xpad_ref, inv_ref, band_ref, smooth_ref, *,
                        k, wc, c, row_tile):
    # same slab pooling as _band_split_kernel, but emits the FULL-RES
    # smooth instead of decimated rows — for encoder levels whose
    # downsample is a strided conv (needs every smooth pixel)
    t = pl.program_id(1)
    pad = (k - 1) // 2
    start = t * row_tile

    slab = xpad_ref[0, pl.ds(start, row_tile + k - 1), :]
    cols = jnp.pad(slab, ((0, 0), (pad * c, (k - 1 - pad) * c)))
    num = jnp.zeros((row_tile, wc), slab.dtype)
    for dy in range(k):
        for dx in range(k):
            num = num + cols[dy:dy + row_tile, dx * c:dx * c + wc]
    smooth = num * inv_ref[0]

    x_tile = xpad_ref[0, pl.ds(start + pad, row_tile), :]
    band_ref[0] = x_tile - smooth
    smooth_ref[0] = smooth


def laplacian_band_smooth_pallas(
        x: jnp.ndarray, kernel_size: int = 2,
        row_tile: int = 32,
        interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, H, W, C] → (band [B,H,W,C], smooth [B,H,W,C]).

    Fuses avg_pool_same(k, stride 1) + subtract into one VMEM pass —
    the unet_laplacian encoder band split
    (models/unet_laplacian.py encoder, reference
    backbone_unet_laplacian.py:366-389) when the downsample that follows
    is a strided conv and needs the full-resolution smooth."""
    b, h, w, c = x.shape
    k = int(kernel_size)
    row_tile = min(row_tile, h)
    while h % row_tile:
        row_tile //= 2
    row_tile = max(1, row_tile)

    pad = (k - 1) // 2
    flat = x.reshape(b, h, w * c)
    flat_padded = jnp.pad(flat, ((0, 0), (pad, k - 1 - pad), (0, 0)))
    inv = jnp.repeat(jnp.asarray(_inv_den(h, w, k))[:, :, None],
                     c, axis=-1).reshape(1, h, w * c).astype(x.dtype)

    kernel = partial(_band_smooth_kernel, k=k, wc=w * c, c=c,
                     row_tile=row_tile)

    band, smooth = pl.pallas_call(
        kernel,
        grid=(b, h // row_tile),
        in_specs=[
            pl.BlockSpec((1, h + k - 1, w * c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row_tile, w * c), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, row_tile, w * c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row_tile, w * c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w * c), x.dtype),
            jax.ShapeDtypeStruct((b, h, w * c), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flat_padded, inv)
    return band.reshape(b, h, w, c), smooth.reshape(b, h, w, c)


def laplacian_band_smooth_reference(x: jnp.ndarray, kernel_size: int = 2):
    """Plain-XLA composition of band+smooth (parity / non-TPU fallback)."""
    from .resize import avg_pool_same
    smooth = avg_pool_same(x, (kernel_size, kernel_size), (1, 1))
    return x - smooth, smooth


def _pool_transpose(z: jnp.ndarray, k: int) -> jnp.ndarray:
    """Aᵀz for the count-aware SAME stride-1 box filter A = D⁻¹S:
    Aᵀz = Sᵀ(D⁻¹z) — scale by the tap-count reciprocal, then sum the k²
    shifts with the TRANSPOSED padding offsets."""
    b, h, w, c = z.shape
    inv = jnp.asarray(_inv_den(h, w, k), z.dtype)[None, :, :, None]
    zi = z * inv
    pad = (k - 1) // 2
    # S pads (pad, k-1-pad); Sᵀ pads the opposite way
    zp = jnp.pad(zi, ((0, 0), (k - 1 - pad, pad), (k - 1 - pad, pad), (0, 0)))
    out = jnp.zeros_like(z)
    for dy in range(k):
        for dx in range(k):
            out = out + zp[:, dy:dy + h, dx:dx + w, :]
    return out


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def laplacian_band_smooth(x: jnp.ndarray,
                          kernel_size: int = 2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable fused band-split: Pallas forward, XLA backward.

    band = x − Ax, smooth = Ax for the linear pooling operator A, so
    dx = g_band + Aᵀ(g_smooth − g_band) — no residuals needed."""
    return laplacian_band_smooth_pallas(x, kernel_size)


def _band_smooth_fwd(x, kernel_size):
    return laplacian_band_smooth_pallas(x, kernel_size), None


def _band_smooth_bwd(kernel_size, _res, grads):
    g_band, g_smooth = grads
    return (g_band + _pool_transpose(g_smooth - g_band, kernel_size),)


laplacian_band_smooth.defvjp(_band_smooth_fwd, _band_smooth_bwd)


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (incl. the environment's
    'axon' PJRT plugin) — the gate for Pallas Mosaic kernels."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
