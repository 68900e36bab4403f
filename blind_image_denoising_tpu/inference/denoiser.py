"""Any-size uint8 denoiser module.

Equivalent of the reference DenoiserModule (module_denoiser.py:15-75):
uint8 → float32 → pad → hydra forward → take the finest-scale output →
unpad → round → uint8.

XLA discipline: shapes must be static under jit, so padding amounts are
computed in Python and the jitted forward is specialized per padded-shape
bucket — then cache hits. Improvements over the reference:

* ``pad_multiple`` mode (default) pads H/W up to a multiple of the model's
  downsample factor (e.g. 64) instead of the next power of two
  (module_denoiser.py:56): a 1241×376 KITTI frame costs 1280×384 pixels
  instead of 2048×512 — 2.6× less compute. Set ``pad_mode="pow2"`` for the
  reference behavior.
* ``tile_rows`` splits very large frames (4K+) into overlapping row bands
  with a receptive-field halo, bounding device memory; bands are stitched
  exactly (fully-convolutional + sufficient halo).
* multi-chip: pass a mesh + margin to shard full frames over the
  'spatial' axis with ICI halo exchange (parallel/spatial.py).
* ``tta`` enables geometric self-ensembling: average the dihedral
  transforms t⁻¹(f(t(x))) (flips × transpose) inside the one jitted
  program. A classic denoising quality lever the reference does not
  have. ``True``/``8`` = the full 8-member group; ``4`` = the flip
  subgroup (¼ the extra compute, no transposed shape buckets); ``2`` =
  {id, 180°}. Measured cost/quality frontier per member count in
  docs/QUALITY_BENCHMARK.md. Every subset is a closed subgroup, so the
  average is exactly equivariant to that subgroup of input transforms.
* ``blend`` serves noise-adaptive input blending (inference/blend.py):
  a per-artifact calibrated alpha(sigma_hat) curve mixes the model
  output with the input so low-noise images are not degraded by the
  model's reconstruction floor — the regime where the reference's own
  README table goes ABOVE the noisy input (reference README.md:83-86).
"""

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.padding import next_power_of_2
from ..parallel.spatial import denoise_spatially_sharded


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _dihedral(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k ∈ 0..7: bit0 = left-right flip, bit1 = up-down flip,
    bit2 = transpose (H↔W). Applied in that order on NHWC."""
    if k & 1:
        x = x[:, :, ::-1, :]
    if k & 2:
        x = x[:, ::-1, :, :]
    if k & 4:
        x = jnp.swapaxes(x, 1, 2)
    return x


def _dihedral_inv(y: jnp.ndarray, k: int) -> jnp.ndarray:
    if k & 4:
        y = jnp.swapaxes(y, 1, 2)
    if k & 2:
        y = y[:, ::-1, :, :]
    if k & 1:
        y = y[:, :, ::-1, :]
    return y


class Denoiser:
    def __init__(self, model, variables, cast_to_uint8: bool = True,
                 pad_mode: str = "multiple", pad_multiple: int = 64,
                 tile_rows: int = 0, tile_halo: int = 64,
                 mesh=None, spatial_margin: int = 0,
                 quant: bool = False, tta: bool = False,
                 blend=None):
        self._model = model
        self._variables = variables
        # noise-adaptive input blending (inference/blend.py): estimate
        # sigma from the input, serve alpha(sigma_hat)*model + (1-alpha)*x
        # with a per-artifact calibrated curve — identity-consistent as
        # sigma -> 0, where the model's error floor exceeds the noise
        if blend is not None and blend is not False:
            from .blend import BlendTable
            self._blend = BlendTable.from_any(blend)
        else:
            self._blend = None
        self._cast = cast_to_uint8
        self._pad_mode = pad_mode
        self._pad_multiple = int(pad_multiple)
        self._tile_rows = int(tile_rows)
        self._tile_halo = int(tile_halo)
        # tta: False/0 = off; True or 8 = full dihedral group; 4 = the
        # flip subgroup {id, lr, ud, lr+ud} (no transpose members — also
        # avoids the second XLA shape bucket on non-square inputs);
        # 2 = {id, 180° rotation}. Each subset is a closed subgroup, so
        # the averaged output is exactly equivariant to that subgroup.
        # Cost/quality frontier measured in docs/QUALITY_BENCHMARK.md.
        members = 8 if tta is True else int(tta or 0)
        if members not in (0, 2, 4, 8):
            raise ValueError(f"tta must be False/True/2/4/8, got {tta!r}")
        self._tta_members = {0: (), 2: (0, 3), 4: (0, 1, 2, 3),
                             8: tuple(range(8))}[members]
        self._tta = members > 0
        if tta and mesh is not None and mesh.shape.get("spatial", 1) > 1:
            raise ValueError(
                "tta=True is single-mesh only: the transpose members of "
                "the dihedral ensemble swap H and W, which breaks a fixed "
                "'spatial' (H-axis) sharding")
        if quant and "quant" not in variables:
            raise ValueError(
                "quant=True needs calibrated scales — run "
                "inference.quantize.calibrate(model, variables, images) "
                "and pass its result as variables")

        def apply_fn(v, x):
            # the quant context wraps the apply itself so the jitted
            # closure TRACES under the int8 mode it serves
            # (ops/quant.py — the mode is trace-time)
            if quant:
                from ..ops.quant import quant_mode
                with quant_mode("int8"):
                    return model.apply(v, x, train=False)[0]
            # a reduced-precision model (bfloat16 serving) returns a
            # reduced-precision tensor; the epilogue (TTA mean, clip/
            # round) must run f32 — bf16 spacing is 1.0 gray level above
            # 128, so rounding there would add avoidable quantization
            return model.apply(v, x, train=False)[0].astype(jnp.float32)

        if mesh is not None and mesh.shape.get("spatial", 1) > 1:
            self._forward = denoise_spatially_sharded(
                apply_fn, variables, mesh, spatial_margin)
            self._jitted_e2e = None
        else:
            self._forward = jax.jit(lambda x: apply_fn(variables, x))
            # whole serving pipeline (widen → pad/tile → forward → unpad →
            # round/clip → cast) as ONE jitted program per input shape:
            # the epilogue fuses into the forward instead of running as
            # separate eager device ops, and a uint8 input ships 4x fewer
            # host→device bytes
            self._jitted_e2e = jax.jit(self._e2e)

    @property
    def model(self):
        """The underlying flax module (e.g. for use as a distillation
        teacher — training/distill.py)."""
        return self._model

    @property
    def variables(self):
        """The loaded variables pytree (params [+ batch_stats/quant])."""
        return self._variables

    def _pad_target(self, n: int) -> int:
        if self._pad_mode == "pow2":
            return next_power_of_2(n)
        return _round_up(n, self._pad_multiple)

    def _run_padded(self, x: jnp.ndarray) -> jnp.ndarray:
        _, h, w, _ = x.shape
        pad_h = self._pad_target(h) - h
        pad_w = self._pad_target(w) - w
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        y = self._forward(x)
        if pad_h or pad_w:
            y = y[:, : y.shape[1] - pad_h, : y.shape[2] - pad_w, :]
        return y

    def _run_tiled(self, x: jnp.ndarray, axis: int = 1,
                   recurse: bool = True) -> jnp.ndarray:
        """Band tiling with halo along ``axis`` (1 = rows, 2 = columns);
        exact for halo ≥ half receptive field (fully-convolutional model).

        Band starts are aligned DOWN to a multiple of ``pad_multiple``
        (≥ the model's total downsample factor): strided/pooled 2×
        downsampling samples absolute row/column parities, so misaligned
        band offsets would shift every pyramid level's phase and leave
        visible seams. Column tiling exists for the transposed members of
        the TTA ensemble (and wide panoramas), whose long dimension lands
        on axis 2. A band whose OTHER spatial axis still exceeds the
        bound takes ONE perpendicular tiling pass (``recurse`` guards
        against ping-ponging: an inner band always spans the outer
        band's tile+2·halo extent), so an image large on both axes
        decomposes into patches of at most (tile+2·halo)²."""
        n = x.shape[axis]
        t, halo = self._tile_rows, self._tile_halo
        align = max(1, self._pad_multiple)
        other = 3 - axis
        outs = []
        for start in range(0, n, t):
            stop = min(start + t, n)
            lo = (max(0, start - halo) // align) * align
            hi = min(n, stop + halo)
            band = x[:, lo:hi] if axis == 1 else x[:, :, lo:hi]
            band = self._run_tiled(band, axis=other, recurse=False) \
                if recurse and band.shape[other] > t \
                else self._run_padded(band)
            sel = slice(start - lo, start - lo + (stop - start))
            outs.append(band[:, sel] if axis == 1 else band[:, :, sel])
        return jnp.concatenate(outs, axis=axis)

    def _float_pipeline(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, C] float32 → [B, H, W, C] float32 (finest scale):
        the full pad/tile/TTA serving computation with no rounding or
        casting epilogue. Differentiable end to end."""
        def run(img):
            if self._tile_rows > 0:
                # tile the LONGER axis first (a TTA transpose member
                # moves the long dimension to axis 2); _run_tiled
                # recurses into the perpendicular axis when a band is
                # still over the bound, so the memory ceiling holds for
                # every orientation AND for images large on both axes
                axis = 1 if img.shape[1] >= img.shape[2] else 2
                if img.shape[axis] > self._tile_rows:
                    return self._run_tiled(img, axis=axis)
            return self._run_padded(img)

        if self._tta:
            # geometric self-ensemble: mean over a closed subgroup of
            # the dihedral group, all forwards traced into the same
            # program (XLA schedules them back-to-back; padding
            # specializes per orientation)
            acc = None
            for k in self._tta_members:
                yk = _dihedral_inv(run(_dihedral(x, k)), k)
                acc = yk if acc is None else acc + yk
            y = acc / float(len(self._tta_members))
        else:
            y = run(x)
        if self._blend is not None:
            # after TTA: blend the (ensembled) model output toward the
            # input by the calibrated per-image weight. Linear in both
            # terms, so float_forward stays differentiable and the exact
            # adaptive filter is alpha*F_model + (1-alpha)*identity
            y = self._blend.apply(x, y)
        return y

    def _e2e(self, x: jnp.ndarray) -> jnp.ndarray:
        """The whole serving pipeline, traceable as one program (rank and
        shapes are static per jit specialization)."""
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        y = self._float_pipeline(x.astype(jnp.float32))
        if squeeze:
            y = y[0]
        y = jnp.clip(jnp.round(y), 0.0, 255.0)
        return y.astype(jnp.uint8) if self._cast else y

    def float_forward(self, image) -> jnp.ndarray:
        """Differentiable float forward: [H, W, C] or [B, H, W, C] float
        in [0, 255] → same-rank float32 denoised image (finest scale),
        running the full pad/tile/TTA pipeline but NO clip/round/uint8
        epilogue. The interpretability tools (analysis.py) differentiate
        through this to extract exact adaptive filters and net-bias maps
        — the reference's "weighted mask per pixel" interpretation
        (reference README.md:24-40) made computable."""
        x = jnp.asarray(image, jnp.float32)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        y = self._float_pipeline(x)
        return y[0] if squeeze else y

    def dispatch(self, image):
        """Enqueue the serving program WITHOUT forcing the result back to
        host: returns the device array (np.asarray(...) completes it).
        This is the pipelining seam the batching frontend uses to keep
        multiple batches in flight — dispatch returns at enqueue time
        while the previous batch still computes/transfers (serving.py
        pipeline; docs/SERVING.md)."""
        if self._jitted_e2e is not None:
            # uint8 in → uint8 out in one fused program; jit specializes
            # (and caches) per input shape/dtype
            return self._jitted_e2e(np.asarray(image))
        # multi-chip spatial path: eager orchestration around the
        # shard_map'd halo forward
        return self._e2e(jnp.asarray(image))

    def __call__(self, image) -> np.ndarray:
        """image: uint8/float [H, W, C] or [B, H, W, C]; returns same rank.
        """
        return np.asarray(self.dispatch(image))
