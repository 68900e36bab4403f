"""Visual walkthrough generator — the reference's notebook suite as a
reproducible script.

The reference ships exploratory Jupyter notebooks
(reference notebooks/test_pyramid_{gaussian,laplacian}.ipynb,
test_details.ipynb, test_stats.ipynb, test_random_crops.ipynb,
test_loss.ipynb, test_pretrained.ipynb) that render the pyramid
decompositions, the details/high-pass ops, local statistics, the crop
sampler, loss shapes, and per-model noise sweeps. Notebooks don't run in
CI and rot; this script generates the same figure set deterministically
into ``docs/figures/`` and is narrated by ``docs/WALKTHROUGH.md``.

Run (CPU, no TPU needed):
    python scripts/walkthrough.py [--only pyramids,losses] [--out DIR]

The ``pretrained`` section runs the packaged artifacts' actual noise
sweeps (reference notebooks/test_pretrained.ipynb) — minutes on CPU;
every other section is seconds.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECTIONS = ("pyramids", "details", "stats", "crops", "losses", "pretrained")


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def _save(fig, out_dir: str, name: str) -> str:
    path = os.path.join(out_dir, name)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    print(f"wrote {path}", flush=True)
    return path


def _gray(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] 0..255 -> [1, H, W, 1] normalized to [-0.5, 0.5]."""
    g = img.astype(np.float32).mean(axis=-1) / 255.0 - 0.5
    return g[None, :, :, None]


def _eval_image(size: int = 512) -> np.ndarray:
    from blind_image_denoising_tpu.images import load_evaluation_images
    return load_evaluation_images(size=size)


def section_pyramids(out_dir: str) -> None:
    """Gaussian/Laplacian decomposition + exact round-trip (reference
    notebooks/test_pyramid_gaussian.ipynb, test_pyramid_laplacian.ipynb)."""
    import jax.numpy as jnp
    from blind_image_denoising_tpu.ops.pyramid import (
        build_pyramid_fn, build_inverse_pyramid_fn)

    plt = _mpl()
    x = jnp.asarray(_gray(_eval_image()[3]))
    for ptype in ("gaussian", "laplacian"):
        cfg = {"levels": 3, "type": ptype, "kernel_size": (5, 5)}
        levels = build_pyramid_fn(cfg)(x)
        recon = build_inverse_pyramid_fn(cfg)(levels)
        err = float(jnp.abs(recon - x).mean())

        fig, axes = plt.subplots(1, 4, figsize=(14, 4))
        axes[0].imshow(np.asarray(x[0, :, :, 0]), cmap="gray",
                       vmin=-0.5, vmax=0.5)
        axes[0].set_title("input")
        for i, lvl in enumerate(levels):
            a = np.asarray(lvl[0, :, :, 0])
            axes[i + 1].imshow(a, cmap="gray")
            axes[i + 1].set_title(
                f"L{i} {lvl.shape[1]}x{lvl.shape[2]}\n"
                f"mean {a.mean():+.3f} sd {a.std():.3f}")
        for ax in axes:
            ax.axis("off")
        fig.suptitle(f"{ptype} pyramid — round-trip MAE {err:.2e}")
        _save(fig, out_dir, f"pyramid_{ptype}.png")
        plt.close(fig)
        assert err < 1e-6, f"{ptype} round-trip degraded: {err}"


def section_details(out_dir: str) -> None:
    """The details / high-pass / low-pass extractors (reference
    notebooks/test_details.ipynb; ops in reference utilities.py:602-620,
    backbone_blocks.py:488-497)."""
    import jax.numpy as jnp
    from blind_image_denoising_tpu.ops.normalize import (
        details, highpass_filter, lowpass_filter, global_normalization)

    plt = _mpl()
    x = jnp.asarray(_gray(_eval_image()[3]))
    xn = global_normalization(x)
    panels = [("input", np.asarray(x[0, :, :, 0]), dict(cmap="gray")),
              ("details(x)", np.asarray(details(x)[0, :, :, 0]),
               dict(cmap="gray")),
              ("highpass(gn(x))",
               np.asarray(highpass_filter(xn)[0, :, :, 0]),
               dict(cmap="gray")),
              ("lowpass(gn(x))",
               np.asarray(lowpass_filter(xn)[0, :, :, 0]),
               dict(cmap="gray"))]
    fig, axes = plt.subplots(1, len(panels), figsize=(16, 4))
    for ax, (title, img, kw) in zip(axes, panels):
        ax.imshow(img, **kw)
        ax.set_title(title)
        ax.axis("off")
    _save(fig, out_dir, "details_ops.png")
    plt.close(fig)


def section_stats(out_dir: str) -> None:
    """Global vs local normalization, and the local-sigma map at two
    window sizes (reference notebooks/test_stats.ipynb;
    reference utilities.py:566-596)."""
    import jax.numpy as jnp
    from blind_image_denoising_tpu.ops.normalize import (
        global_normalization, local_normalization)
    from blind_image_denoising_tpu.ops.resize import avg_pool_same

    plt = _mpl()
    x = jnp.asarray(_gray(_eval_image()[2]))

    def local_sigma(img, k):
        mean = avg_pool_same(img, (k, k), (1, 1))
        var = avg_pool_same(jnp.square(img - mean), (k, k), (1, 1))
        return jnp.sqrt(var)

    panels = [("input", x), ("global_normalization", global_normalization(x)),
              ("local_normalization 16x16", local_normalization(x)),
              ("local sigma 5x5", local_sigma(x, 5)),
              ("local sigma 11x11", local_sigma(x, 11))]
    fig, axes = plt.subplots(1, len(panels), figsize=(20, 4))
    for ax, (title, img) in zip(axes, panels):
        a = np.asarray(img[0, :, :, 0])
        ax.imshow(a, cmap="gray")
        ax.set_title(f"{title}\nmean {a.mean():+.2f} sd {a.std():.2f}")
        ax.axis("off")
    _save(fig, out_dir, "stats_normalization.png")
    plt.close(fig)


def section_crops(out_dir: str) -> None:
    """The random-crop sampler as a collage (reference
    notebooks/test_random_crops.ipynb; reference utilities.py random_crops)."""
    import random as pyrandom
    from blind_image_denoising_tpu.data.dataset import random_crops
    from blind_image_denoising_tpu.visualize import collage

    plt = _mpl()
    imgs = _eval_image(size=256)
    rng = pyrandom.Random(0)
    crops = np.stack([
        c for img in imgs
        for c in random_crops(img, crop_size=(64, 64), no_crops=4, rng=rng)])
    grid = collage(crops.astype(np.uint8))
    fig, ax = plt.subplots(figsize=(7, 7))
    ax.imshow(grid)
    ax.set_title(f"random_crops: 4 x 64x64 from each of 4 eval images")
    ax.axis("off")
    _save(fig, out_dir, "random_crops.png")
    plt.close(fig)


def section_losses(out_dir: str) -> None:
    """Loss shapes: hinged MAE/RMSE vs per-pixel error and the GAR
    robust curve (reference notebooks/test_loss.ipynb prints a single
    soft_orthogonal value; the plotted curves document the hinge/cutoff
    semantics of reference loss.py)."""
    import jax
    import jax.numpy as jnp
    from blind_image_denoising_tpu.ops.losses import (
        mae_diff, rmse_diff, gar_loss)
    from blind_image_denoising_tpu.ops.regularizers import soft_orthogonal

    plt = _mpl()
    e = jnp.linspace(-30.0, 30.0, 601)
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for hinge in (0.0, 2.5, 5.0):
        per_px_mae = jax.vmap(
            lambda v: mae_diff(v.reshape(1, 1, 1, 1), hinge=hinge))(e)
        per_px_rmse = jax.vmap(
            lambda v: rmse_diff(v.reshape(1, 1, 1, 1), hinge=hinge))(e)
        axes[0].plot(np.asarray(e), np.asarray(per_px_mae),
                     label=f"hinge {hinge:g}")
        axes[1].plot(np.asarray(e), np.asarray(per_px_rmse),
                     label=f"hinge {hinge:g}")
    axes[0].set_title("hinged MAE (per-pixel)")
    axes[1].set_title("hinged RMSE (per-pixel)")
    for alpha, c in ((1.0, 1.0), (0.5, 2.0), (2.0, 1.0)):
        axes[2].plot(np.asarray(e),
                     np.asarray(gar_loss(e / 10.0, alpha=alpha, c=c)),
                     label=f"alpha {alpha:g} c {c:g}")
    axes[2].set_title("GAR robust loss (x/10)")
    for ax in axes:
        ax.grid(alpha=0.3)
        ax.legend()
        ax.set_xlabel("error (gray levels)")
    _save(fig, out_dir, "loss_shapes.png")
    plt.close(fig)

    # the reference notebook's actual smoke check (test_loss.ipynb cell 3
    # prints one soft_orthogonal value), on a conv-kernel-shaped tensor
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))
    print(f"soft_orthogonal(random 3x3x8x16 kernel) = "
          f"{float(soft_orthogonal(w)):.4f}", flush=True)


def section_pretrained(out_dir: str, size: int, stds, n_images: int) -> None:
    """Per-model noise sweep: MAE / improvement / PSNR vs sigma for every
    packaged artifact (reference notebooks/test_pretrained.ipynb's three
    figures), measured on the packaged eval images."""
    import blind_image_denoising_tpu as bid

    plt = _mpl()
    clean = _eval_image(size=512)[:n_images, :size, :size, :]
    rng = np.random.default_rng(0)
    rows = []
    for name in sorted(bid.models):
        den = bid.load_model(name)
        for sigma in stds:
            noise = np.clip(rng.normal(0, sigma, clean.shape),
                            -2 * sigma, 2 * sigma)
            noisy = np.clip(np.round(clean + noise), 0, 255).astype(np.uint8)
            out = np.asarray(den(noisy)).astype(np.float32)
            mae_n = float(np.abs(noisy.astype(np.float32) - clean).mean())
            mae_d = float(np.abs(out - clean).mean())
            mse = float(np.square(out - clean).mean())
            rows.append({"model": name, "sigma": sigma,
                         "mae_noisy": mae_n, "mae_denoised": mae_d,
                         "improvement": mae_n - mae_d,
                         "psnr": 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-9))})
            print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                              for k, v in rows[-1].items()}), flush=True)

    fig, axes = plt.subplots(1, 3, figsize=(18, 5))
    for name in sorted(set(r["model"] for r in rows)):
        sub = [r for r in rows if r["model"] == name]
        xs = [r["sigma"] for r in sub]
        axes[0].plot(xs, [r["mae_denoised"] for r in sub], "-o", label=name)
        axes[1].plot(xs, [r["improvement"] for r in sub], "-o", label=name)
        axes[2].plot(xs, [r["psnr"] for r in sub], "-o", label=name)
    axes[0].plot(xs, [r["mae_noisy"] for r in sub], "k--", label="noisy input")
    axes[0].set_title("MAE vs sigma")
    axes[1].set_title("improvement (MAE noisy - denoised)")
    axes[2].set_title("PSNR vs sigma")
    for ax in axes:
        ax.set_xlabel("noise std")
        ax.grid(alpha=0.3)
        ax.legend(fontsize=8)
    _save(fig, out_dir, "pretrained_sweep.png")
    plt.close(fig)
    with open(os.path.join(out_dir, "pretrained_sweep.json"), "w") as f:
        json.dump(rows, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help=f"comma-separated subset of {SECTIONS}")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "figures"))
    ap.add_argument("--size", type=int, default=128,
                    help="pretrained-sweep eval size (CPU-friendly default)")
    ap.add_argument("--images", type=int, default=2,
                    help="pretrained-sweep image count")
    ap.add_argument("--stds", default="1,10,20,40,60,80")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.out, exist_ok=True)
    wanted = (args.only.split(",") if args.only else list(SECTIONS))
    for w in wanted:
        if w not in SECTIONS:
            raise SystemExit(f"unknown section [{w}] (have {SECTIONS})")
    if "pyramids" in wanted:
        section_pyramids(args.out)
    if "details" in wanted:
        section_details(args.out)
    if "stats" in wanted:
        section_stats(args.out)
    if "crops" in wanted:
        section_crops(args.out)
    if "losses" in wanted:
        section_losses(args.out)
    if "pretrained" in wanted:
        section_pretrained(args.out, args.size,
                           [int(s) for s in args.stds.split(",")],
                           args.images)
    print("walkthrough complete", flush=True)


if __name__ == "__main__":
    main()
