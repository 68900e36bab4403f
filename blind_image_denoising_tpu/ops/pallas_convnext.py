"""Fused ConvNext-block TPU kernel with producer-side int8 storage.

THE perf problem this solves (docs/QUANTIZATION.md, docs/PERF.md): the
flagship denoiser is HBM-bandwidth-bound at ~100% of the v5e's bandwidth
in bf16, so bytes are wall-clock. int8 through XLA made it SLOWER
(+9% bytes) because XLA materializes the int32 conv accumulators and the
dequantized float tensors alongside the int8 ones. The only way to halve
bytes again is to keep every float intermediate in VMEM and let ONLY int8
touch HBM — which is exactly what a fused kernel can do and a composition
of XLA ops cannot.

One kernel invocation = one whole ConvNext residual block
(reference custom_layers.py:838-1022; layers/convnext.py):

    t   = LayerNorm(depthwise5x5(x))        # f32 stats, eps 1e-3, scale
    h   = leaky_relu(W_expand @ t, 0.1)     # 1x1, C -> 4C
    p   = W_project @ h                     # 1x1, 4C -> C
    out = x + gamma * p                     # ChannelLearnableMultiplier+skip

HBM traffic per block: read x int8 (+2-row halo), write out int8. All
intermediates — the dequantized activations, the 4C expansion, the LN
statistics — live and die in VMEM at f32/bf16 precision, so the ONLY
quantization error is at block boundaries (the residual stream), not
inside the arithmetic. This differs from ops/quant.py (int8 MXU matmuls
with per-channel weight scales): here the matmuls run bf16 on the MXU —
at 4% MXU utilization the chip has arithmetic to burn; int8 is purely a
STORAGE format.

Layout — why channels-first: two prior Pallas attempts (band-split,
fused ConvNext core in NHWC) measurably LOST to XLA because Mosaic pads
the lane (last) dimension to 128 and the flagship's C=32 channels-last
rows waste 4x on every load/store. Here tensors are [B, C, rows*W]:
C sits in sublanes (32 = exactly one int8 sublane tile) and the flattened
spatial extent sits in lanes (W is 128-aligned at every fused level), so
nothing pads. The 1x1 convs become [4C, C] @ [C, N] matmuls with the
contraction over sublanes — MXU-native.

Spatial convention: tensors carry ``pad`` zero rows above and below the
image ([B, C, (H + 2*pad) * W], valid rows at [pad, pad+H)), so a row
band plus its depthwise halo is ONE contiguous lane slice and the kernel
has no boundary special cases; edge grid steps re-zero the pad rows of
the output. Left/right borders are handled in-kernel with column masks
(flattened row wrap-around must read as SAME zero padding).

MEASURED OUTCOME (v5e, scan-chain K-differenced — full campaign in
docs/QUANTIZATION.md round 3): per block this kernel is 2.8x faster than
a STANDALONE XLA bf16 block chain (4.25 vs 11.8 ms at C32 b32 @256²),
but the flagship's in-context XLA blocks cost only ~4.9 ms — within ~10%
— so the end-to-end fused model is 0.93x. Ablation (all compute stages
removed → same time; copy skeleton → 0.03 ms) shows the block is
VPU-elementwise-bound, not HBM-bound, at these channel widths; the int8
byte halving therefore doesn't convert to wall-clock on THIS model. The
kernel ships as a tested option for architectures with lighter
per-position work between the matmuls.

Used by inference/fused.py (fused int8 serving path for the flagship
family). Equivalence against layers/convnext.ConvNextBlock is tested in
tests/test_pallas_convnext.py.
"""

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT8_MAX = 127.0
LN_EPS = 1e-3  # DEFAULT_LN_EPSILON — constants.py / reference constants.py


def _block_kernel(x_ref, dw_ref, ln_ref, w2_ref, w3_ref, g_ref, out_ref,
                  xs_raw, xs_deq, out_buf, zeros_buf, in_sem, out_sem,
                  *, W, R, pad, C, E, H, nb, scale_in, scale_out, slope,
                  quant_io):
    """One grid step computes one row band of one batch element.

    The grid is COLLAPSED to 1-D (batch * bands): measured on v5e, a 2-D
    (B, bands) grid costs ~0.6 us/step more in Mosaic grid bookkeeping —
    ~0.3 ms per block pass at the flagship's 512 steps (floor probe:
    copy-skeleton 0.316 ms on the 2-D grid vs 0.031 ms on 1-D).

    Refs: x/out in HBM (manual halo DMA), weights resident in VMEM
    (dw [C, K*K], ln scale [C, 1], w2 [E, C], w3 [C, E], gamma [C, 1]).
    """
    g = pl.program_id(0)
    b = g // nb
    j = jax.lax.rem(g, nb)
    K = 2 * pad + 1
    M = (R + 2 * pad) * W          # rows in the haloed input slab
    N = R * W                      # output lanes per band
    marg = 128                     # lane margin so tap slices never underflow

    # --- haloed input slab: rows [j*R, j*R + R + 2*pad) of the padded
    # tensor — contiguous lanes thanks to the pad-row convention
    pltpu.make_async_copy(
        x_ref.at[b, :, pl.ds(j * R * W, M)], xs_raw, in_sem).start()
    pltpu.make_async_copy(
        x_ref.at[b, :, pl.ds(j * R * W, M)], xs_raw, in_sem).wait()

    if quant_io:
        xs_deq[:, marg:marg + M] = (
            xs_raw[:].astype(jnp.bfloat16) * jnp.bfloat16(scale_in))
    else:
        xs_deq[:, marg:marg + M] = xs_raw[:]

    # --- depthwise KxK, SAME zero padding. Tap (dy, dx) of output local
    # row r reads slab row (pad + r + dy); in flattened lanes that is a
    # static slice at (pad+dy)*W + dx. Column masks zero the row
    # wrap-around that flattening introduces at left/right borders.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) % W
    acc = jnp.zeros((C, N), jnp.float32)
    for dy in range(-pad, pad + 1):
        for dx in range(-pad, pad + 1):
            tap = (dy + pad) * K + (dx + pad)
            start = marg + (pad + dy) * W + dx
            v = xs_deq[:, start:start + N].astype(jnp.float32) \
                * dw_ref[:, tap:tap + 1]
            if dx > 0:
                v = jnp.where(col < W - dx, v, 0.0)
            elif dx < 0:
                v = jnp.where(col >= -dx, v, 0.0)
            acc = acc + v

    # --- LayerNorm over C (sublane reduction), f32 statistics — the
    # exact FastLayerNorm recipe (layers/norm.py): mean of squared
    # deviations, rsqrt(var + eps), scale, no bias
    mean = jnp.mean(acc, axis=0, keepdims=True)
    cent = acc - mean
    var = jnp.mean(cent * cent, axis=0, keepdims=True)
    t = (cent * jax.lax.rsqrt(var + LN_EPS) * ln_ref[:]).astype(jnp.bfloat16)

    # --- 1x1 expand (C -> E) + leaky_relu, then 1x1 project (E -> C);
    # bf16 MXU matmuls, f32 accumulation, contraction over sublanes
    h = jnp.dot(w2_ref[:], t, preferred_element_type=jnp.float32)
    h = jnp.where(h >= 0.0, h, h * slope).astype(jnp.bfloat16)
    p = jnp.dot(w3_ref[:], h, preferred_element_type=jnp.float32)

    # --- gamma gain + residual (the dequantized input band)
    res = xs_deq[:, marg + pad * W:marg + pad * W + N].astype(jnp.float32)
    out = res + g_ref[:] * p

    if quant_io:
        q = jnp.round(out * (1.0 / scale_out))
        out_buf[:] = jnp.clip(q, -INT8_MAX, INT8_MAX).astype(jnp.int8)
    else:
        out_buf[:] = out.astype(out_buf.dtype)

    pltpu.make_async_copy(
        out_buf, out_ref.at[b, :, pl.ds((pad + j * R) * W, N)],
        out_sem).start()

    # --- edge steps re-zero the output's pad rows so the NEXT fused
    # block's halo reads see SAME zero padding
    @pl.when(j == 0)
    def _():
        zeros_buf[:] = jnp.zeros_like(zeros_buf)
        pltpu.make_async_copy(
            zeros_buf, out_ref.at[b, :, pl.ds(0, pad * W)], in_sem).start()
        pltpu.make_async_copy(
            zeros_buf, out_ref.at[b, :, pl.ds(0, pad * W)], in_sem).wait()

    @pl.when(j == nb - 1)
    def _():
        zeros_buf[:] = jnp.zeros_like(zeros_buf)
        pltpu.make_async_copy(
            zeros_buf, out_ref.at[b, :, pl.ds((pad + H) * W, pad * W)],
            in_sem).start()
        pltpu.make_async_copy(
            zeros_buf, out_ref.at[b, :, pl.ds((pad + H) * W, pad * W)],
            in_sem).wait()

    pltpu.make_async_copy(
        out_buf, out_ref.at[b, :, pl.ds((pad + j * R) * W, N)],
        out_sem).wait()


def _pick_rows(H: int, W: int, E: int) -> int:
    """Largest band height that divides H, keeps the 4C expansion under
    ~2 MB of f32 VMEM, and lands the band on whole 128-lane vectors."""
    budget = max(1, (2 * 1024 * 1024) // (4 * E * W))
    r = min(H, budget)
    while r > 1 and (H % r or (r * W) % 128):
        r -= 1
    if H % r or (r * W) % 128:
        raise ValueError(f"no valid row tiling for H={H} W={W}")
    return r


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "pad", "scale_in", "scale_out", "slope",
                     "rows", "interpret"))
def fused_convnext_block(x, dw_w, ln_scale, w2, w3, gamma_gain,
                         *, H: int, W: int, pad: int = 2,
                         scale_in: float = 1.0,
                         scale_out: float = 1.0,
                         slope: float = 0.1,
                         rows: Optional[int] = None,
                         interpret: bool = False):
    """Run one fused ConvNext block over a padded channels-first tensor.

    ``x``: [B, C, (H + 2*pad) * W] int8 (quantized mode) or bf16/f32
    (float mode — used for equivalence testing and as a bf16-storage
    fallback). Returns the same shape/dtype.

    Weights (already transposed to channels-first):
      dw_w [C, K*K] f32 — depthwise kernel, K = 2*pad+1, taps row-major
      ln_scale [C, 1] f32, w2 [E, C] bf16-castable, w3 [C, E],
      gamma_gain [C, 1] f32 — the PRE-ACTIVATED tanh(max(1+w, 0)) gain.
    """
    B, C, Np = x.shape
    assert Np == (H + 2 * pad) * W, (Np, H, W, pad)
    E = w2.shape[0]
    K = 2 * pad + 1
    assert dw_w.shape == (C, K * K)
    quant_io = x.dtype == jnp.int8
    R = rows or _pick_rows(H, W, E)
    M = (R + 2 * pad) * W
    io_dtype = x.dtype
    vm_dtype = jnp.bfloat16 if quant_io else io_dtype

    nb = H // R
    kernel = functools.partial(
        _block_kernel, W=W, R=R, pad=pad, C=C, E=E, H=H, nb=nb,
        scale_in=float(scale_in), scale_out=float(scale_out),
        slope=float(slope), quant_io=quant_io)

    resident = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda g: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B * nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # x (HBM, manual DMA)
            resident(C, K * K),                          # dw
            resident(C, 1),                              # ln scale
            resident(E, C),                              # w2
            resident(C, E),                              # w3
            resident(C, 1),                              # gamma
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, C, Np), io_dtype),
        scratch_shapes=[
            pltpu.VMEM((C, M), io_dtype),                # raw DMA slab
            pltpu.VMEM((C, 128 + M + 128), vm_dtype),    # dequantized slab
            pltpu.VMEM((C, R * W), io_dtype),            # output band
            pltpu.VMEM((C, pad * W), io_dtype),          # zeros for pad rows
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, dw_w.astype(jnp.float32), ln_scale.astype(jnp.float32),
      w2.astype(vm_dtype), w3.astype(vm_dtype),
      gamma_gain.astype(jnp.float32))


# ----------------------------------------------------------------------
# layout + reference helpers (used by inference/fused.py and tests)
# ----------------------------------------------------------------------

def to_cf_padded(x_nhwc, pad: int = 2):
    """[B, H, W, C] -> padded channels-first [B, C, (H+2*pad)*W]."""
    B, H, W, C = x_nhwc.shape
    x = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    return x.reshape(B, C, (H + 2 * pad) * W)


def from_cf_padded(x_cf, H: int, W: int, pad: int = 2):
    """Inverse of :func:`to_cf_padded`."""
    B, C, _ = x_cf.shape
    x = x_cf.reshape(B, C, H + 2 * pad, W)[:, :, pad:pad + H, :]
    return jnp.transpose(x, (0, 2, 3, 1))


def quantize_cf(x_cf_float, scale: float):
    q = jnp.round(x_cf_float.astype(jnp.float32) * (1.0 / scale))
    return jnp.clip(q, -INT8_MAX, INT8_MAX).astype(jnp.int8)


def block_weights_from_params(params, dtype=jnp.bfloat16):
    """Extract one ConvNextBlock's fused-kernel weights from its linen
    param subtree (layers/convnext.py naming: conv_1/kernel [K,K,1,C],
    conv_1/ln/scale [C], conv_2/kernel [1,1,C,E], conv_3/kernel [1,1,E,C],
    gamma/w_multiplier [C])."""
    dw = jnp.asarray(params["conv_1"]["kernel"], jnp.float32)
    K = dw.shape[0]
    C = dw.shape[3]
    dw_cf = dw.reshape(K * K, C).T                      # [C, K*K]
    ln = jnp.asarray(params["conv_1"]["ln"]["scale"],
                     jnp.float32).reshape(C, 1)
    w2 = jnp.asarray(params["conv_2"]["kernel"], jnp.float32)
    w2_cf = w2.reshape(C, w2.shape[3]).T                # [E, C]
    w3 = jnp.asarray(params["conv_3"]["kernel"], jnp.float32)
    w3_cf = w3.reshape(w3.shape[2], C).T                # [C, E]
    gw = jnp.asarray(params["gamma"]["w_multiplier"], jnp.float32)
    gain = jnp.tanh(jnp.maximum(1.0 + gw, 0.0)).reshape(C, 1)
    return dict(dw_w=dw_cf, ln_scale=ln, w2=w2_cf.astype(dtype),
                w3=w3_cf.astype(dtype), gamma_gain=gain)


def convnext_block_reference(x_nhwc, weights, slope: float = 0.1):
    """Pure-jnp NHWC reference of the fused block (float path) for
    equivalence tests — the same math as layers/convnext.ConvNextBlock
    at inference with the flagship options."""
    from jax import lax
    B, H, W, C = x_nhwc.shape
    dw = weights["dw_w"]                                 # [C, K*K]
    K = int(np.sqrt(dw.shape[1]))
    k_hwio = dw.T.reshape(K, K, 1, C)
    y = lax.conv_general_dilated(
        x_nhwc.astype(jnp.float32), k_hwio.astype(jnp.float32),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    t = (y - mean) * jax.lax.rsqrt(var + LN_EPS) \
        * weights["ln_scale"].reshape(C)
    h = jnp.einsum("bhwc,ec->bhwe", t, weights["w2"].astype(jnp.float32))
    h = jnp.where(h >= 0, h, h * slope)
    p = jnp.einsum("bhwe,ce->bhwc", h, weights["w3"].astype(jnp.float32))
    return x_nhwc + weights["gamma_gain"].reshape(C) * p
