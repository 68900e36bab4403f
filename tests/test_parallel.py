"""Multi-device tests on the 8-virtual-CPU mesh: DP equivalence and
spatial halo-exchange correctness. The reference has no distributed paths
to test (SURVEY §2.9); these cover the new TPU-native capability."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blind_image_denoising_tpu.parallel.mesh import (
    create_mesh, data_sharding, replicate_sharding, shard_batch,
    shard_train_step)
from blind_image_denoising_tpu.parallel.spatial import (
    denoise_spatially_sharded, spatial_shard_image, receptive_field_margin)


def test_mesh_creation():
    mesh = create_mesh(data=-1)
    assert mesh.shape["data"] == len(jax.devices())
    mesh = create_mesh(data=4, spatial=2)
    assert mesh.shape == {"data": 4, "spatial": 2}
    with pytest.raises(ValueError):
        create_mesh(data=len(jax.devices()) + 1)


def test_spatial_halo_exchange_matches_single_device():
    """H-sharded fully-convolutional forward with halo exchange must equal
    the unsharded forward (up to float assoc)."""
    from blind_image_denoising_tpu.layers.conv import ConvBlock
    import flax.linen as nn

    class TinyCNN(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = ConvBlock(features=8, kernel_size=3, activation="relu",
                          name="c1")(x)
            x = ConvBlock(features=3, kernel_size=3, name="c2")(x)
            return x

    model = TinyCNN()
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(1, 64, 32, 3)).astype(np.float32))
    vs = model.init(jax.random.PRNGKey(0), x)

    expected = np.asarray(model.apply(vs, x))

    mesh = create_mesh(data=2, spatial=4)
    # margin 2 covers the two 3x3 convs' receptive field (radius 2)
    fwd = denoise_spatially_sharded(
        lambda v, im: model.apply(v, im), vs, mesh, margin=2)
    got = np.asarray(fwd(spatial_shard_image(mesh, x)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_receptive_field_margin_monotone():
    assert receptive_field_margin(1) < receptive_field_margin(2) \
        < receptive_field_margin(3)


@pytest.mark.parametrize("use_bn", [False, True])
def test_dp_train_step_matches_single_device(use_bn):
    """The same train step on a 1-device and an 8-device mesh must produce
    identical parameters (GSPMD DP is numerically the same computation).

    The use_bn=True variant verifies the parallel/mesh.py claim that BN
    batch statistics are computed over the GLOBAL batch under DP — a
    per-shard-stats regression would change batch_stats and params here."""
    from blind_image_denoising_tpu.models.hydra import model_builder
    from blind_image_denoising_tpu.training.losses import loss_function_builder
    from blind_image_denoising_tpu.training.optimizer import optimizer_builder
    from blind_image_denoising_tpu.training.train_state import create_train_state
    from blind_image_denoising_tpu.training.train_step import build_train_step

    cfg = {"backbone": {
        "type": "resnet", "input_shape": ["?", "?", 3], "filters": 4,
        "no_layers": 1, "kernel_size": 3, "block_kernels": [3, 3],
        "block_filters": [4, 4], "activation": "relu", "batchnorm": use_bn,
        "value_range": [0, 255], "kernel_regularizer": "l1",
        "kernel_initializer": "glorot_normal"},
        "denoiser": {"use_bias": False, "output_channels": 3}}
    loss_fns = loss_function_builder(
        {"hinge": 0.0, "mae_multiplier": 1.0, "ssim_multiplier": -1.0,
         "regularization": 0.01})
    tx, _ = optimizer_builder({
        "type": "ADAM", "schedule": {"type": "cosine_decay", "config": {
            "learning_rate": 0.01, "decay_steps": 1000}}})

    hydra = model_builder(cfg).hydra
    sample = jnp.zeros((8, 16, 16, 3))
    state = create_train_state(hydra, tx, jax.random.PRNGKey(0), sample)
    step = build_train_step(hydra, tx, loss_fns, no_outputs=1,
                            additive_noise=[5, 10], grad_accum=1)

    batch = jnp.asarray(np.random.default_rng(1)
                        .uniform(0, 255, (8, 16, 16, 3)).astype(np.float32))
    rng = jax.random.PRNGKey(7)
    dw = jnp.ones((1,), jnp.float32)

    # single device
    s1, m1 = jax.jit(step)(state, batch, rng, dw)
    # 8-device DP
    mesh = create_mesh(data=-1)
    sharded = shard_train_step(step, mesh)
    s8, m8 = sharded(
        jax.device_put(state, replicate_sharding(mesh)),
        shard_batch(mesh, batch),
        jax.device_put(rng, replicate_sharding(mesh)),
        jax.device_put(dw, replicate_sharding(mesh)))

    assert float(m1["total_loss"]) == pytest.approx(
        float(m8["total_loss"]), rel=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    if use_bn:
        bs1 = jax.tree_util.tree_leaves(s1.batch_stats)
        bs8 = jax.tree_util.tree_leaves(s8.batch_stats)
        assert bs1 and len(bs1) == len(bs8)
        for a, b in zip(bs1, bs8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # ~60 s; the driver itself runs dryrun_multichip every round
def test_graft_entry_dryrun():
    """The driver's multichip dry run must pass on the virtual mesh."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(len(jax.devices()))


def test_spatial_halo_flagship_unet_laplacian():
    """Halo-exchange inference of a REAL (tiny) unet_laplacian matches the
    unsharded forward when the margin covers its receptive field — the
    correctness insurance for multi-chip full-frame denoising."""
    from blind_image_denoising_tpu.models.hydra import model_builder

    cfg = {"backbone": {
        "type": "unet_laplacian", "input_shape": ["?", "?", 3],
        "depth": 2, "width": 1, "filters": 4,
        "encoder_kernel_size": 3, "decoder_kernel_size": 3,
        "gaussian_kernel_size": 2, "activation": "leaky_relu_01",
        "upsample_type": "upsample_nearest_conv2d", "downsample_type": "strides",
        "use_bn": False, "use_ln": True, "use_bias": False,
        "use_concat": False, "use_gamma": True,
        "use_laplacian_averaging": True, "use_mix_project": False,
        "use_self_attention": False, "use_attention_gates": False,
        "use_output_normalization": False,
        "multiple_scale_outputs": False, "depth_drop_rate": 0.0,
        "kernel_regularizer": "l2", "kernel_initializer": "glorot_normal"},
        "denoiser": {"filters": 4, "use_bias": False, "output_channels": 3}}
    hydra = model_builder(cfg).hydra
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 255, (1, 64, 32, 3)).astype(np.float32))
    vs = hydra.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    vs = {k: v for k, v in vs.items() if k in ("params", "batch_stats")}

    expected = np.asarray(hydra.apply(vs, x, train=False)[0])

    mesh = create_mesh(data=2, spatial=4)
    # margin must be a multiple of the total downsample factor (2) and
    # cover the receptive field of the depth-2, k3 model
    fwd = denoise_spatially_sharded(
        lambda v, im: hydra.apply(v, im, train=False)[0], vs, mesh,
        margin=receptive_field_margin(2, 3, 1))
    got = np.asarray(fwd(spatial_shard_image(mesh, x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)


def test_multislice_dcn_mesh_train_step_matches_single_device():
    """Mesh('dcn','data','spatial') — the multi-slice layout — must produce
    the same parameters as single-device: the batch shards over
    ('dcn','data'), GSPMD reduces gradients over ICI then DCN."""
    from blind_image_denoising_tpu.models.hydra import model_builder
    from blind_image_denoising_tpu.training.losses import loss_function_builder
    from blind_image_denoising_tpu.training.optimizer import optimizer_builder
    from blind_image_denoising_tpu.training.train_state import create_train_state
    from blind_image_denoising_tpu.training.train_step import build_train_step

    cfg = {"backbone": {
        "type": "resnet", "input_shape": ["?", "?", 3], "filters": 4,
        "no_layers": 1, "kernel_size": 3, "block_kernels": [3],
        "block_filters": [4], "activation": "relu", "batchnorm": False,
        "value_range": [0, 255], "kernel_regularizer": "l1",
        "kernel_initializer": "glorot_normal"},
        "denoiser": {"use_bias": False, "output_channels": 3}}
    loss_fns = loss_function_builder(
        {"hinge": 0.0, "mae_multiplier": 1.0, "ssim_multiplier": -1.0})
    tx, _ = optimizer_builder({
        "type": "ADAM", "schedule": {"type": "cosine_decay", "config": {
            "learning_rate": 0.01, "decay_steps": 1000}}})

    hydra = model_builder(cfg).hydra
    sample = jnp.zeros((8, 16, 16, 3))
    state = create_train_state(hydra, tx, jax.random.PRNGKey(0), sample)
    step = build_train_step(hydra, tx, loss_fns, no_outputs=1,
                            additive_noise=[5, 10], grad_accum=1)
    batch = jnp.asarray(np.random.default_rng(2)
                        .uniform(0, 255, (8, 16, 16, 3)).astype(np.float32))
    rng = jax.random.PRNGKey(3)
    dw = jnp.ones((1,), jnp.float32)

    s1, m1 = jax.jit(step)(state, batch, rng, dw)

    mesh = create_mesh(dcn=2, data=2, spatial=2)
    assert mesh.shape == {"dcn": 2, "data": 2, "spatial": 2}
    sharded = shard_train_step(step, mesh)
    s8, m8 = sharded(
        jax.device_put(state, replicate_sharding(mesh)),
        shard_batch(mesh, batch),
        jax.device_put(rng, replicate_sharding(mesh)),
        jax.device_put(dw, replicate_sharding(mesh)))
    assert float(m1["total_loss"]) == pytest.approx(
        float(m8["total_loss"]), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_host_sharded_file_lists():
    """Per-process shards are disjoint, cover everything, and preserve the
    per-dataset structure (so round-robin mixing survives on every host)."""
    from blind_image_denoising_tpu.data.file_operations import (
        shard_files_for_process)

    groups = [[f"a{i}" for i in range(7)], [f"b{i}" for i in range(3)]]
    shards = [shard_files_for_process(groups, p, 2) for p in range(2)]
    for g_idx in range(2):
        combined = sorted(shards[0][g_idx] + shards[1][g_idx])
        assert combined == sorted(groups[g_idx])
        assert not set(shards[0][g_idx]) & set(shards[1][g_idx])
    # identity when single-process
    assert shard_files_for_process(groups, 0, 1) == groups
    with pytest.raises(ValueError):
        shard_files_for_process(groups, 2, 2)


def test_dataset_builder_process_sharding(tmp_path):
    """dataset_builder with process_index/process_count config keys decodes
    a disjoint file subset per simulated host."""
    from PIL import Image
    from blind_image_denoising_tpu.data.dataset import dataset_builder

    d = tmp_path / "ds"
    d.mkdir()
    for i in range(6):
        Image.fromarray(np.full((20, 20, 3), 40 * i, np.uint8)).save(
            d / f"{i}.png")

    seen = []
    for p in range(2):
        cfg = {"batch_size": 1, "input_shape": [8, 8, 3],
               "inputs": [{"directory": str(d)}],
               "process_index": p, "process_count": 2}
        res = dataset_builder(cfg)
        vals = set()
        for b in res.training:
            vals.update(np.unique(b).astype(int).tolist())
        seen.append(vals)
    # each host sees a PROPER, nonempty subset; union covers all levels
    assert seen[0] and seen[1]
    assert seen[0] | seen[1] == {0, 40, 80, 120, 160, 200}
    assert seen[0] != seen[1]


@pytest.mark.parametrize("backbone", [
    "resnet",
    # the flagship variant costs ~43 s; the resnet one (~13 s) keeps the
    # spatial-training contract in the default tier
    pytest.param("unet_laplacian", marks=pytest.mark.slow),
])
def test_spatial_training_matches_single_device(backbone):
    """Spatially-parallel TRAINING: the batch's H dim sharded over the
    'spatial' mesh axis (GSPMD auto-halo for convs/pools/resizes) must
    produce the same updated parameters as the unsharded step. Exercises
    the flagship's band-split/down/up ops under spatial partitioning."""
    from blind_image_denoising_tpu.models.hydra import model_builder
    from blind_image_denoising_tpu.training.losses import loss_function_builder
    from blind_image_denoising_tpu.training.optimizer import optimizer_builder
    from blind_image_denoising_tpu.training.train_state import create_train_state
    from blind_image_denoising_tpu.training.train_step import build_train_step

    if backbone == "resnet":
        bb = {"type": "resnet", "input_shape": ["?", "?", 3], "filters": 4,
              "no_layers": 1, "kernel_size": 3, "block_kernels": [3, 3],
              "block_filters": [4, 4], "activation": "relu",
              "batchnorm": False, "value_range": [0, 255],
              "kernel_regularizer": "l1"}
        no_outputs = 1
    else:
        # use_self_attention: the bottleneck ConvolutionalSelfAttention
        # (fixed-16² resize + full QK^T) is the riskiest op under
        # H-sharding — the packaged flagship config enables it
        bb = {"type": "unet_laplacian", "input_shape": ["?", "?", 3],
              "depth": 2, "width": 1, "filters": 4,
              "use_self_attention": True, "multiple_scale_outputs": True,
              "value_range": [0, 255]}
        no_outputs = 2
    cfg = {"backbone": bb,
           "denoiser": {"use_bias": False, "filters": 4,
                        "output_channels": 3}}
    loss_fns = loss_function_builder(
        {"hinge": 0.0, "mae_multiplier": 1.0, "ssim_multiplier": -1.0,
         "regularization": 0.01})
    tx, _ = optimizer_builder({
        "type": "ADAM", "schedule": {"type": "cosine_decay", "config": {
            "learning_rate": 0.01, "decay_steps": 1000}}})

    hydra = model_builder(cfg).hydra
    sample = jnp.zeros((2, 32, 32, 3))
    state = create_train_state(hydra, tx, jax.random.PRNGKey(0), sample)
    step = build_train_step(hydra, tx, loss_fns, no_outputs=no_outputs,
                            additive_noise=[5, 10], grad_accum=1)

    batch = jnp.asarray(np.random.default_rng(2)
                        .uniform(0, 255, (2, 32, 32, 3)).astype(np.float32))
    rng = jax.random.PRNGKey(9)
    dw = jnp.full((no_outputs,), 1.0 / no_outputs, jnp.float32)

    s1, m1 = jax.jit(step)(state, batch, rng, dw)

    mesh = create_mesh(data=2, spatial=4)
    sharded = shard_train_step(step, mesh, spatial=True)
    s8, m8 = sharded(
        jax.device_put(state, replicate_sharding(mesh)),
        jax.device_put(batch, data_sharding(mesh, spatial=True)),
        jax.device_put(rng, replicate_sharding(mesh)),
        jax.device_put(dw, replicate_sharding(mesh)))

    assert float(m1["total_loss"]) == pytest.approx(
        float(m8["total_loss"]), rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_weak_scaling_shard_shapes_constant():
    """Weak-scaling SHAPE contract: doubling the data axis with
    per-device batch held fixed keeps every device's addressable shard
    the same shape (the property that makes 'bandwidth scales linearly
    with chips' the right model for this bandwidth-bound workload —
    docs/PARALLELISM.md scaling model)."""
    from blind_image_denoising_tpu.parallel.mesh import (
        create_mesh, data_sharding)

    per_device = 2
    shapes = {}
    for n in (2, 4, 8):
        mesh = create_mesh(data=n, devices=jax.devices()[:n])
        batch = jnp.zeros((per_device * n, 16, 16, 3), jnp.float32)
        arr = jax.device_put(batch, data_sharding(mesh))
        local = {d.shape for d in arr.addressable_shards_shapes} \
            if hasattr(arr, "addressable_shards_shapes") else \
            {s.data.shape for s in arr.addressable_shards}
        assert local == {(per_device, 16, 16, 3)}, (n, local)
        shapes[n] = local
    assert shapes[2] == shapes[4] == shapes[8]


@pytest.mark.slow
@pytest.mark.parametrize("n_devices", [16, 32])
def test_graft_entry_dryrun_wide(n_devices):
    """VERDICT r3 #4: the collective structure must hold beyond the
    8-device session mesh — run the full dryrun (DP + spatial-4 halo
    ring + spatially-sharded training + DCN multislice) at 16 and 32
    virtual devices in a fresh process (device count is fixed at
    backend init, so a subprocess is required)."""
    import os
    import subprocess
    import sys
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # the child sets its own device count
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, "-c",
         f"import __graft_entry__; "
         f"__graft_entry__.dryrun_multichip({n_devices})"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=900)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "DP train step OK" in out.stdout
    assert "spatial halo-exchange inference OK" in out.stdout
    assert "spatially-sharded train step OK" in out.stdout
    assert "DCN multislice train step OK" in out.stdout
    if n_devices >= 16:
        assert "'spatial': 4" in out.stdout, out.stdout[-2000:]
