"""On-device image degradations — the reference's declared-but-dead
dataset options made real.

The reference parses five augmentation keys it never applies
(reference dataset.py:83-105: ``random_rotate``, ``random_blur``,
``use_jpeg_noise``, ``quantization``, ``inpaint_drop_rate`` — all consumed
into locals and then unused by ``prepare_data_fn``, dataset.py:120-238,
which only flips and adds noise). This module implements them as
jit-friendly, per-sample, on-device ops so the config keys take effect:

* ``rotate_batch`` / ``random_rotate_batch`` — geometric augmentation of
  the CLEAN batch (like flips): per-sample bilinear rotation with reflect
  fill, angle ~ U[-a, a] radians (the reference key is "in radians",
  dataset.py:88).
* ``random_blur`` — per-sample separable Gaussian blur (optical blur in
  front of the sensor noise), σ ~ U[lo, hi], applied with probability 0.5
  per sample like the reference's noise branches.
* ``random_jpeg`` / ``jpeg_artifacts`` — real DCT-domain JPEG distortion:
  8×8 orthonormal DCT (identical to the JPEG spec's normalization),
  Annex-K quantization tables scaled by a per-sample quality
  ~ U[25, 75] (the reference's own hard-coded ``jpeg_quality`` range,
  dataset.py:104-105), RGB↔YCbCr. Entropy coding is lossless and
  therefore omitted; chroma is kept 4:4:4 (documented deviation — the
  quality-25..75 artifacts are dominated by coefficient quantization).
* ``random_quantize`` — bit-depth reduction to multiples of q
  (the reference key's comment: "2, 4, 8", dataset.py:100-102), applied
  with probability 0.5 per sample.
* ``inpaint_dropout`` — per-pixel Bernoulli hole mask (shared across
  channels) zeroing ``drop_rate`` of the pixels, so the denoiser also
  learns local inpainting (the reference docstring promises "a binary
  mask for inpainting", dataset.py:124-128, but never builds one).

``degrade_batch`` composes them in physical-pipeline order:
blur (optics) → multiplicative/additive noise (sensor) → JPEG
(compression, on the [0,255]-clipped signal like a real encoder) →
quantization (bit depth) → inpainting holes → rounding. Everything is
pure ``jax.numpy`` on [B,H,W,C] float arrays in [0, 255] and fuses into
the jitted train step alongside ``ops.noise.corrupt_batch``.
"""

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates

from .noise import corrupt_batch

# ---------------------------------------------------------------------------
# rotation (geometric — applied to the clean batch, like flips)
# ---------------------------------------------------------------------------


def rotate_batch(batch: jnp.ndarray, angles: jnp.ndarray,
                 mode: str = "reflect") -> jnp.ndarray:
    """Per-sample rotation of a [B,H,W,C] batch by ``angles`` [B] radians
    (counter-clockwise in image coordinates) around the image center,
    bilinear interpolation, ``mode`` fill at the borders."""

    def rotate_one(img: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
        h, w = img.shape[0], img.shape[1]
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32),
                              indexing="ij")
        cos, sin = jnp.cos(angle), jnp.sin(angle)
        # inverse map: source coords that land on each output pixel
        ys = cos * (yy - cy) - sin * (xx - cx) + cy
        xs = sin * (yy - cy) + cos * (xx - cx) + cx
        return jax.vmap(
            lambda ch: map_coordinates(ch, [ys, xs], order=1, mode=mode),
            in_axes=2, out_axes=2)(img)

    return jax.vmap(rotate_one)(batch, angles.reshape(-1))


def random_rotate_batch(key: jax.Array, batch: jnp.ndarray,
                        max_angle: float) -> jnp.ndarray:
    """Rotation augmentation: per-sample angle ~ U[-max_angle, +max_angle]
    radians (``dataset.random_rotate`` — reference dataset.py:87-89)."""
    angles = jax.random.uniform(
        key, (batch.shape[0],),
        minval=-float(max_angle), maxval=float(max_angle))
    return rotate_batch(batch, angles)


# ---------------------------------------------------------------------------
# blur (degradation — applied to the noisy path)
# ---------------------------------------------------------------------------


def separable_blur_batch(batch: jnp.ndarray, sigmas: jnp.ndarray,
                         taps: int = 7) -> jnp.ndarray:
    """Per-sample separable Gaussian blur of [B,H,W,C] with per-sample
    ``sigmas`` [B]. Implemented as ``taps`` shifted-and-weighted adds per
    axis (edge padding) — fully batched VPU work, no per-sample conv
    dispatch; kernels are renormalized so the truncation at
    radius=(taps-1)/2 never loses mass."""
    r = (taps - 1) // 2
    off = jnp.arange(taps, dtype=jnp.float32) - r
    sig = jnp.maximum(sigmas.reshape(-1, 1).astype(jnp.float32), 1e-3)
    w = jnp.exp(-0.5 * (off[None, :] / sig) ** 2)
    w = w / jnp.sum(w, axis=1, keepdims=True)  # [B, taps]

    def pass_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
        pad = [(0, 0)] * 4
        pad[axis] = (r, r)
        xp = jnp.pad(x, pad, mode="edge")
        out = jnp.zeros_like(x)
        for k in range(taps):
            sl = [slice(None)] * 4
            sl[axis] = slice(k, k + x.shape[axis])
            out = out + w[:, k, None, None, None] * xp[tuple(sl)]
        return out

    return pass_axis(pass_axis(batch, 1), 2)


def random_blur(key: jax.Array, batch: jnp.ndarray,
                sigma_range: Tuple[float, float] = (0.1, 2.0),
                prob: float = 0.5, taps: int = 7) -> jnp.ndarray:
    """Blur degradation (``dataset.random_blur`` — reference
    dataset.py:84-85): with probability ``prob`` per sample, Gaussian
    blur with σ ~ U[sigma_range]."""
    k_flag, k_sig = jax.random.split(key)
    b = batch.shape[0]
    flags = jax.random.uniform(k_flag, (b, 1, 1, 1)) < prob
    sig = jax.random.uniform(k_sig, (b,), minval=float(sigma_range[0]),
                             maxval=float(sigma_range[1]))
    return jnp.where(flags, separable_blur_batch(batch, sig, taps), batch)


# ---------------------------------------------------------------------------
# JPEG artifacts
# ---------------------------------------------------------------------------

# ITU-T T.81 Annex K.1 reference quantization tables
_JPEG_LUMA_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.float32)

_JPEG_CHROMA_Q = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.float32)


def _dct8() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix. For N=8 the orthonormal scaling
    √(2/N)·c_u equals the JPEG spec's (1/4)·C(u) normalization, so the
    Annex-K tables apply to these coefficients directly."""
    k = np.arange(8)
    d = np.sqrt(2.0 / 8.0) * np.cos(
        np.pi * (2 * k[None, :] + 1) * k[:, None] / 16.0)
    d[0] *= 1.0 / np.sqrt(2.0)
    return d.astype(np.float32)


def _quality_scaled_table(base: np.ndarray, quality: jnp.ndarray) -> jnp.ndarray:
    """libjpeg quality scaling: table entries floor((base·S + 50)/100)
    clipped to [1, 255], S = 5000/Q below 50 else 200 − 2Q.
    ``quality`` [B] → tables [B, 8, 8]."""
    q = jnp.clip(quality.astype(jnp.float32), 1.0, 100.0)
    scale = jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q)
    tbl = jnp.floor((jnp.asarray(base)[None] * scale[:, None, None] + 50.0)
                    / 100.0)
    return jnp.clip(tbl, 1.0, 255.0)


def _jpeg_channel(x: jnp.ndarray, tbl: jnp.ndarray) -> jnp.ndarray:
    """DCT-quantize-reconstruct one plane batch. x [B,H,W] (level-shifted,
    H and W multiples of 8), tbl [B,8,8]."""
    b, h, w = x.shape
    d = jnp.asarray(_dct8())
    blocks = x.reshape(b, h // 8, 8, w // 8, 8)
    coef = jnp.einsum("ui,bhiwj,vj->bhuwv", d, blocks, d)
    qt = tbl[:, None, :, None, :]
    coef = jnp.round(coef / qt) * qt
    rec = jnp.einsum("ui,bhuwv,vj->bhiwj", d, coef, d)
    return rec.reshape(b, h, w)


def jpeg_artifacts(batch: jnp.ndarray, quality: jnp.ndarray) -> jnp.ndarray:
    """JPEG compression distortion of a [B,H,W,C] batch in [0,255] at a
    per-sample ``quality`` [B] ∈ [1,100]: 8×8 block DCT, Annex-K table
    quantization (luma table on Y / single-channel planes, chroma table
    on Cb/Cr), inverse DCT. Entropy coding (lossless) and 4:2:0 chroma
    subsampling are omitted; inputs are clipped to [0,255] like a real
    encoder. H/W not divisible by 8 are edge-padded and cropped back."""
    b, h, w, c = batch.shape
    ph, pw = (-h) % 8, (-w) % 8
    x = jnp.clip(batch, 0.0, 255.0).astype(jnp.float32)
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")

    tbl_l = _quality_scaled_table(_JPEG_LUMA_Q, quality)
    tbl_c = _quality_scaled_table(_JPEG_CHROMA_Q, quality)

    if c == 3:
        r, g, bl = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
        y = _jpeg_channel(y - 128.0, tbl_l) + 128.0
        cb = _jpeg_channel(cb - 128.0, tbl_c) + 128.0
        cr = _jpeg_channel(cr - 128.0, tbl_c) + 128.0
        out = jnp.stack([
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0)], axis=-1)
    else:
        planes = [_jpeg_channel(x[..., i] - 128.0, tbl_l) + 128.0
                  for i in range(c)]
        out = jnp.stack(planes, axis=-1)

    out = jnp.clip(out, 0.0, 255.0)
    if ph or pw:
        out = out[:, :h, :w, :]
    return out.astype(batch.dtype)


def random_jpeg(key: jax.Array, batch: jnp.ndarray,
                quality_range: Tuple[float, float] = (25.0, 75.0),
                prob: float = 0.5) -> jnp.ndarray:
    """JPEG degradation (``dataset.use_jpeg_noise`` — reference
    dataset.py:103-105, whose hard-coded quality range [25, 75] is the
    default here): with probability ``prob`` per sample, compress at
    quality ~ U[quality_range]."""
    k_flag, k_q = jax.random.split(key)
    b = batch.shape[0]
    flags = jax.random.uniform(k_flag, (b, 1, 1, 1)) < prob
    quality = jax.random.uniform(
        k_q, (b,), minval=float(quality_range[0]),
        maxval=float(quality_range[1]))
    return jnp.where(flags, jpeg_artifacts(batch, quality), batch)


# ---------------------------------------------------------------------------
# bit-depth quantization / inpainting holes
# ---------------------------------------------------------------------------


def quantize_batch(batch: jnp.ndarray, q: float) -> jnp.ndarray:
    """Posterize to multiples of ``q`` (reference ``dataset.quantization``
    comment: "2, 4, 8" — dataset.py:100-102)."""
    return jnp.round(batch / q) * q


def random_quantize(key: jax.Array, batch: jnp.ndarray, q: float,
                    prob: float = 0.5) -> jnp.ndarray:
    """Per-sample bit-depth reduction with probability ``prob``."""
    flags = jax.random.uniform(key, (batch.shape[0], 1, 1, 1)) < prob
    return jnp.where(flags, quantize_batch(batch, float(q)), batch)


def inpaint_dropout(key: jax.Array, batch: jnp.ndarray,
                    drop_rate: float, prob: float = 1.0) -> jnp.ndarray:
    """Zero a Bernoulli(``drop_rate``) per-pixel hole mask (shared across
    channels) so the model learns local inpainting
    (``dataset.inpaint_drop_rate`` — reference dataset.py:85).

    ``prob`` gates the degradation PER SAMPLE like the other ops
    (default 1.0 keeps the deterministic semantics the evaluate
    harness's corruption chains rely on — deterministic per key, though
    NOT bit-identical to pre-round-4 builds: adding the gate moved the
    mask onto a split subkey, so a given key now draws a different hole
    pattern than it did before the ``prob`` parameter existed). The
    round-4a restoration run
    showed why the gate matters in training: ungated holes on 100% of
    samples drive the MAE-optimal estimator toward heavy spatial
    filtering everywhere, degrading every other task
    (docs/TRAINING_DEMO.md round 4)."""
    b, h, w, _ = batch.shape
    k_flag, k_mask = jax.random.split(key)
    keep = jax.random.uniform(k_mask, (b, h, w, 1)) >= float(drop_rate)
    holed = jnp.where(keep, batch, jnp.zeros_like(batch))
    if prob >= 1.0:
        return holed
    flags = jax.random.uniform(k_flag, (b, 1, 1, 1)) < prob
    return jnp.where(flags, holed, batch)


# ---------------------------------------------------------------------------
# full degradation chain
# ---------------------------------------------------------------------------


def degrade_batch(
        key: jax.Array,
        clean: jnp.ndarray,
        additive_noise: Optional[Sequence[float]] = None,
        multiplicative_noise: Optional[Sequence[float]] = None,
        noise_sampling: str = "uniform",
        round_values: bool = True,
        use_random_blur: bool = False,
        blur_sigma_range: Tuple[float, float] = (0.1, 2.0),
        use_jpeg_noise: bool = False,
        jpeg_quality_range: Tuple[float, float] = (25.0, 75.0),
        quantization: int = -1,
        inpaint_drop_rate: float = 0.0,
        degradation_prob: float = 0.5,
        chain_prob: float = 1.0) -> jnp.ndarray:
    """The full corruption chain, physical-pipeline ordered: optics (blur)
    → sensor (multiplicative/additive noise, ops/noise.py semantics) →
    encoder (JPEG on the clipped signal) → bit depth (quantization) →
    missing pixels (inpainting holes) → rounding. The clean batch is
    untouched — ground truth stays the caller's responsibility.

    ``degradation_prob`` is the PER-SAMPLE gate shared by every extended
    op (blur/JPEG/posterize/holes; the noise probabilities keep the
    reference's own 50/50 semantics). At p each sample sees a random
    SUBSET of the enabled ops, so the train distribution spans
    mild-to-harsh instead of uniformly harsh — with k ops enabled a
    fraction (1−p)^k of samples stays degradation-free (noise aside),
    preserving the near-clean regime.

    ``chain_prob`` is a per-sample MASTER gate ABOVE the per-op gates:
    samples failing it receive ONLY the noise path (``corrupt_batch``
    with the same noise key — the pure-denoising task, bit-identical
    noise draw). Per-op gating alone leaves just (1−p)^k clean-class
    samples (6% at p=0.5, k=4), which round 5 measured as identity
    forgetting: the restoration fine-tune's σ=1 floor rose to 6.9 MAE
    vs the donor's 0.9. At ``chain_prob`` c the clean class is a
    guaranteed (1−c) fraction regardless of op count. The default 1.0
    is bit-identical to the pre-round-5 stream (master flags drawn from
    a ``fold_in`` of the caller's key, never from the 5-way split)."""
    k_blur, k_noise, k_jpeg, k_quant, k_inp = jax.random.split(key, 5)
    p = float(degradation_prob)
    noisy = clean
    if use_random_blur:
        noisy = random_blur(k_blur, noisy, sigma_range=blur_sigma_range,
                            prob=p)
    noisy = corrupt_batch(k_noise, noisy,
                          additive_noise=additive_noise,
                          multiplicative_noise=multiplicative_noise,
                          round_values=False,
                          noise_sampling=noise_sampling)
    if use_jpeg_noise:
        noisy = random_jpeg(k_jpeg, noisy, quality_range=jpeg_quality_range,
                            prob=p)
    if quantization and quantization > 1:
        noisy = random_quantize(k_quant, noisy, float(quantization), prob=p)
    if inpaint_drop_rate and inpaint_drop_rate > 0.0:
        noisy = inpaint_dropout(k_inp, noisy, float(inpaint_drop_rate),
                                prob=p)
    c = float(chain_prob)
    if c < 1.0:
        noise_only = corrupt_batch(k_noise, clean,
                                   additive_noise=additive_noise,
                                   multiplicative_noise=multiplicative_noise,
                                   round_values=False,
                                   noise_sampling=noise_sampling)
        k_chain = jax.random.fold_in(key, 0x5EED)
        flags = jax.random.uniform(
            k_chain, (clean.shape[0], 1, 1, 1)) < c
        noisy = jnp.where(flags, noisy, noise_only)
    if round_values:
        noisy = jnp.round(noisy)
    return noisy
