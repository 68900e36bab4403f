"""The training orchestration loop.

Equivalent of reference train_loop.py:40-601:
  1. load config, save the as-run copy
  2. build dataset / losses / optimizer / hydra
  3. restore the latest checkpoint (or load fine-tune weights)
  4. epoch loop: jitted fused train step (fwd + per-scale deep-supervised
     losses + regularization + grad accumulation + update in ONE XLA
     program), per-step scalar metrics, periodic noise-sweep evaluation on
     the packaged eval images at std ∈ {0, 20, 40, 60, 80}
     (reference train_loop.py:507-529), periodic weight/gradient statistics,
     checkpoint every N steps + per epoch.

TPU-first differences from the reference:
  * flips + noise + GT pyramid run on device inside the step
  * grad accumulation is lax.scan inside the step, not a Python counter
  * data parallelism over a Mesh('data','spatial') with GSPMD collectives
  * checkpoints include optimizer state (reference loses Adam moments)
"""

import os
import time
from pathlib import Path
from typing import Dict, Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..config import load_config, save_config
from ..constants import TOTAL_LOSS_STR
from ..data.dataset import dataset_builder
from ..images import load_evaluation_images
from ..logger import logger
from ..models.hydra import model_builder
from ..ops.losses import mae, psnr
from ..ops.noise import corrupt_batch_fixed_std
from ..parallel.mesh import create_mesh, shard_train_step
from .checkpoint import CheckpointManager
from .losses import loss_function_builder
from .metrics import MetricsWriter
from .optimizer import deep_supervision_schedule_builder, optimizer_builder
from .train_state import TrainState, create_train_state, param_count
from .train_step import build_eval_step, build_train_step

EVAL_NOISE_STDS = (0.0, 20.0, 40.0, 60.0, 80.0)


def resolve_degradation_options(dataset_config: Dict) -> Dict:
    """Resolve the five degradation keys the reference parses but never
    applies (reference dataset.py:83-105) into ``build_train_step``
    kwargs.

    They are live ONLY under the explicit ``dataset.apply_degradations``
    opt-in: every config in the reference's ecosystem carries aggressive
    values (``inpaint_drop_rate`` 0.5, ``random_rotate`` 1.57) on the
    assumption that they do nothing, so activating them silently would
    retrain a different task on any imported or packaged recipe.
    ``scripts/train_restoration.py`` sets the flag."""
    apply = bool(dataset_config.get("apply_degradations", False))
    resolved = {
        "random_rotate": float(dataset_config.get("random_rotate") or 0.0),
        "use_random_blur": bool(dataset_config.get("random_blur", False)),
        "use_jpeg_noise": bool(dataset_config.get("use_jpeg_noise", False)),
        "quantization": int(dataset_config.get("quantization") or -1),
        "inpaint_drop_rate": float(
            dataset_config.get("inpaint_drop_rate") or 0.0),
        # per-sample gate shared by the extended ops (round-4a lesson:
        # ungated holes on every sample wreck the mild-corruption regime)
        "degradation_prob": float(
            dataset_config.get("degradation_prob", 0.5)),
        # master per-sample gate over the whole extended chain: samples
        # failing it get the pure noise path (identity-skill anchor for
        # restoration fine-tunes — ops/degradations.degrade_batch)
        "degradation_chain_prob": float(
            dataset_config.get("degradation_chain_prob", 1.0)),
    }
    neutral = {"random_rotate": 0.0, "use_random_blur": False,
               "use_jpeg_noise": False, "quantization": -1,
               "inpaint_drop_rate": 0.0, "degradation_prob": 0.5,
               "degradation_chain_prob": 1.0}
    active = sorted(k for k, v in resolved.items()
                    if v != neutral[k]
                    and not (k == "quantization" and v <= 1))
    if not apply:
        if active:
            logger.info(
                "dataset config sets %s but dataset.apply_degradations is "
                "not true — inert, matching the reference's behavior; set "
                "\"apply_degradations\": true to train the restoration task",
                ", ".join(active))
        return neutral
    if active:
        logger.info("on-device degradation chain ACTIVE: %s",
                    ", ".join(active))
    return resolved


def train_loop(
        pipeline_config: Union[str, Dict, Path],
        checkpoint_directory: Union[str, Path],
        weights_directory: Union[str, Path, None] = None,
        total_steps_override: Optional[int] = None) -> TrainState:
    from ..parallel import multihost
    config = load_config(pipeline_config)

    ckpt_dir = Path(str(checkpoint_directory))
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    if multihost.is_primary():
        save_config(config, os.path.join(str(ckpt_dir), "config.json"))

    train_config = config["train"]
    dataset_config = config["dataset"]
    tpu_config = config.get("tpu", {})

    # --- dataset. Multi-host: config batch_size is the GLOBAL batch; each
    # process decodes 1/Nth (a disjoint file shard — dataset_builder calls
    # shard_files_for_process) and the shards are assembled into global
    # arrays at prefetch time (parallel/multihost.put_batch).
    n_proc = multihost.process_count()
    batch_size = int(dataset_config["batch_size"])
    if n_proc > 1:
        if batch_size % n_proc:
            raise ValueError(
                f"global batch_size {batch_size} not divisible by "
                f"{n_proc} processes")
        if dataset_config.get("inputs") and not dataset_config.get("repeat"):
            # per-host file shards yield DIFFERENT batch counts per epoch
            # (odd file counts, min_crop_std rejections), and a host that
            # runs even one extra step leaves its peers' collectives
            # without participants — a deadlock, not an error message.
            # Multi-host training is steps-based by construction.
            raise ValueError(
                "multi-host training requires dataset.repeat=true with "
                "train.total_steps (epoch-bounded per-host file shards "
                "desynchronize the cross-host step count)")
        dataset_config = dict(dataset_config,
                              batch_size=batch_size // n_proc)
    dataset = dataset_builder(dataset_config)
    input_shape = dataset.input_shape

    # --- loss / optimizer
    loss_fns = loss_function_builder(config["loss"])
    tx, lr_schedule = optimizer_builder(train_config["optimizer"])

    # --- model (optional bfloat16 compute via the tpu config section —
    # params stay f32, conv/activation math runs MXU-native bf16)
    compute_dtype = tpu_config.get("compute_dtype", "float32")
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    builder_results = model_builder(config["model"], dtype=dtype)
    hydra = builder_results.hydra

    rng = jax.random.PRNGKey(0)
    # init at batch 1: parameter shapes are batch-independent, and a
    # global-batch-size init would materialize the full forward on ONE
    # device (multi-host: the global batch on a single chip = OOM)
    sample = jnp.zeros((1, input_shape[0], input_shape[1],
                        input_shape[2]), jnp.float32)
    state = create_train_state(hydra, tx, rng, sample)
    no_outputs = len(hydra.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        sample[:1], train=False))
    logger.info(f"hydra built: {param_count(state)/1e3:.1f}k params, "
                f"{no_outputs} output scales")

    # --- checkpoint manager + restore
    manager = CheckpointManager(
        str(ckpt_dir),
        max_to_keep=train_config.get("checkpoints_to_keep", 3))
    state = manager.restore(state)

    if weights_directory is not None and int(state.step) == 0:
        # fine-tune: load params only — from another run's latest
        # checkpoint, or from an EXPORTED ARTIFACT dir (params.msgpack,
        # e.g. a packaged pretrained model): the "fine-tune the shipped
        # flagship" path needs no original checkpoint directory
        try:
            import flax.serialization as _fser
            artifact = Path(str(weights_directory)) / "params.msgpack"
            if artifact.is_file():
                raw = _fser.msgpack_restore(artifact.read_bytes())
                state = state.replace(params=_fser.from_state_dict(
                    state.params, raw["params"]))
                if raw.get("batch_stats") and state.batch_stats:
                    state = state.replace(
                        batch_stats=_fser.from_state_dict(
                            state.batch_stats, raw["batch_stats"]))
                logger.info(f"loaded fine-tune weights from artifact "
                            f"{artifact}")
            else:
                donor = CheckpointManager(str(weights_directory),
                                          max_to_keep=1)
                donor_state = donor.restore(state)
                # an EMA-tracking donor's averaged weights are the ones
                # its own export ships — fine-tune from those, not the
                # raw iterate
                donor_params = donor_state.ema_params \
                    if donor_state.ema_params is not None \
                    else donor_state.params
                state = state.replace(params=donor_params,
                                      batch_stats=donor_state.batch_stats)
                logger.info(
                    f"loaded fine-tune weights from {weights_directory}"
                    + (" (EMA)" if donor_state.ema_params is not None
                       else ""))
        except Exception as e:
            logger.warning(f"fine-tune weight load failed ({e}); "
                           f"training from scratch")

    # --- optional weight EMA (train.ema = decay, e.g. 0.9995). Tracked
    # inside the jitted step; evaluation below and export prefer the EMA
    # weights. New capability vs the reference (no weight averaging).
    ema_decay = float(train_config.get("ema", 0.0))
    if not 0.0 <= ema_decay < 1.0:
        raise ValueError(f"train.ema must be in [0, 1), got {ema_decay}")
    if ema_decay > 0.0:
        if state.ema_params is None or int(state.step) == 0:
            # fresh run, fine-tuned weights, or a resume from a pre-EMA
            # checkpoint: seed the average at the current weights — as a
            # COPY: the jitted step donates the state, and aliased
            # params/ema_params buffers would be donated twice
            state = state.replace(ema_params=jax.tree_util.tree_map(
                lambda p: jnp.array(p, copy=True), state.params))
        logger.info(f"weight EMA on (decay {ema_decay}, "
                    f"num_updates-style ramp)")
    elif state.ema_params is not None:
        # EMA switched off for this run: a stale average must not keep
        # riding along (export prefers ema_params whenever present)
        state = state.replace(ema_params=None)
        logger.info("dropping checkpointed ema_params (train.ema is 0)")

    # --- parallel setup: DP over all devices (clamped so the per-step
    # batch divides the data axis)
    import math
    mesh_cfg = tpu_config.get("mesh", {"data": -1})
    spatial = int(mesh_cfg.get("spatial", 1))
    # tpu.mesh.dcn: multi-slice training — outermost mesh axis so the
    # per-step gradient reduce stays on ICI and only the slice combine
    # crosses the data-center network (parallel/mesh.py)
    dcn = max(1, int(mesh_cfg.get("dcn", 1)))
    data = mesh_cfg.get("data", -1)
    if data == -1:
        data = len(jax.devices()) // (spatial * dcn)
    if batch_size % dcn:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"dcn={dcn} slices")
    # clamp so the ('dcn','data')-sharded batch divides evenly
    data = math.gcd(int(data), batch_size // dcn)
    if n_proc > 1 and dcn * data * spatial != len(jax.devices()):
        # jax.devices() is process-major, so a clamped mesh that drops
        # devices drops whole PROCESSES from the mesh — those ranks would
        # then fail batch assembly or hang a collective instead of
        # getting a clear error here
        raise ValueError(
            f"multi-host mesh dcn={dcn} x data={data} x spatial={spatial} "
            f"covers {dcn * data * spatial} of {len(jax.devices())} global "
            f"devices (data was clamped to divide batch_size={batch_size}); "
            f"every process must own mesh devices — use a global "
            f"batch_size divisible by "
            f"{len(jax.devices()) // (spatial * dcn) * dcn} (so 'data' can "
            f"span all devices), or raise tpu.mesh.spatial/dcn so "
            f"dcn*data*spatial covers all {len(jax.devices())} devices")
    if dcn * data * spatial < len(jax.devices()):
        # single-host: legal, but silently idling chips surprises people —
        # say so (the multi-host case above is a hard error instead)
        logger.warning(
            f"mesh dcn={dcn} x data={data} x spatial={spatial} uses "
            f"{dcn * data * spatial} of {len(jax.devices())} devices "
            f"(data clamped to divide batch_size={batch_size}); use a "
            f"batch_size divisible by "
            f"{len(jax.devices()) // (spatial * dcn) * dcn} to engage "
            f"every device")
    mesh = create_mesh(data=data, spatial=spatial, dcn=dcn)
    # tpu.mesh.spatial_training: also shard the crop's H dim over the
    # 'spatial' axis inside the train step (GSPMD auto-halo) — train on
    # crops larger than one chip's HBM. Equivalence-tested in
    # tests/test_parallel.py; multi-host covered by
    # tests/test_multihost.py (each process supplies its full-H local
    # batch rows and make_array_from_process_local_data assembles the
    # (batch x H)-sharded global array — valid because every process owns
    # COMPLETE spatial groups, enforced below).
    spatial_training = bool(mesh_cfg.get("spatial_training", False)) \
        and spatial > 1
    if spatial_training and n_proc > 1:
        local = len(jax.local_devices())
        if local % spatial:
            # the ('dcn','data','spatial') reshape over process-major
            # devices puts a spatial group across a process boundary —
            # a process could not supply full-H rows for its shard
            raise ValueError(
                f"spatial_training with {n_proc} processes requires the "
                f"per-process device count ({local}) to be divisible by "
                f"spatial={spatial} so each process owns whole spatial "
                f"groups")
    if bool(mesh_cfg.get("spatial_training", False)) and not spatial_training:
        logger.warning(
            "tpu.mesh.spatial_training requested but NOT active "
            f"(spatial={spatial}) — it needs spatial > 1; the step will "
            "run without H sharding")
    logger.info(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices"
                + (" (spatially-sharded training)" if spatial_training
                   else ""))

    grad_accum = max(1, int(train_config.get("gpu_batches_per_step", 1)))

    # --- optional teacher-student distillation (training/distill.py)
    teacher_fn, distill_opts = None, {}
    distill_cfg = train_config.get("distillation")
    if distill_cfg:
        from .distill import build_teacher
        teacher_fn, distill_opts = build_teacher(distill_cfg)

    degr = resolve_degradation_options(dataset_config)

    visualization_every = train_config.get("visualization_every", 1000)
    # per-kernel gradient five-number summaries for boxplot figures
    # (reference train_loop.py:532-541); on whenever visualization is on,
    # force off with train.grad_stats=false
    grad_stats = bool(train_config.get("grad_stats",
                                       visualization_every > 0))

    def _make_step(with_stats: bool):
        step_fn = build_train_step(
            hydra, tx, loss_fns,
            no_outputs=no_outputs,
            additive_noise=dataset_config.get("additional_noise"),
            multiplicative_noise=dataset_config.get("multiplicative_noise"),
            noise_sampling=dataset_config.get("noise_sampling", "uniform"),
            random_left_right=dataset_config.get("random_left_right", True),
            random_up_down=dataset_config.get("random_up_down", True),
            # the reference parses-but-ignores these five
            # (dataset.py:83-105); here they are real on-device
            # degradations (ops/degradations.py), gated behind the explicit
            # dataset.apply_degradations opt-in so configs carrying the
            # reference's (dead) values keep training the reference task
            **degr,
            round_values=dataset_config.get("round_values", True),
            grad_accum=grad_accum,
            remat=train_config.get("remat", False),
            use_pallas_noise=tpu_config.get("pallas_noise", False),
            grad_stats=with_stats,
            teacher_fn=teacher_fn,
            distill_weight=distill_opts.get("weight", 1.0),
            distill_gt_weight=distill_opts.get("gt_weight", 1.0),
            ema_decay=ema_decay)
        return shard_train_step(step_fn, mesh, spatial=spatial_training)

    # two compiled programs: the hot step carries NO per-kernel percentile
    # sorts; the stats variant (compiled lazily at its first use) runs
    # only on steps whose gradients actually feed the boxplot figures —
    # observability costs nothing on the other visualization_every-1
    # steps (VERDICT r2 #7)
    train_step = _make_step(False)
    stats_step = _make_step(True) if grad_stats else None
    eval_step = jax.jit(build_eval_step(hydra))

    # --- deep supervision schedule
    ds_schedule = deep_supervision_schedule_builder(
        train_config.get("deep_supervision", {"type": "linear_low_to_high"}),
        no_outputs=no_outputs)

    # --- eval batch (packaged images, pow2-padded 512²), replicated onto
    # the mesh (a global array in multi-host so it can meet the global
    # train-state inside eval_step)
    from ..parallel.mesh import replicate_sharding
    use_test_images = train_config.get("use_test_images", True)
    eval_batch = multihost.replicate(
        replicate_sharding(mesh),
        np.asarray(load_evaluation_images(512), np.float32)) \
        if use_test_images else None

    writer = MetricsWriter(str(ckpt_dir), enabled=multihost.is_primary())
    import json as _json
    writer.text(0, "config", _json.dumps(config, indent=2))

    # pay the TB/torch import NOW, not inside the step loop (single-host:
    # the first logged step would stall tens of seconds and skew
    # steps_per_second; multi-host: a >30 s rank-asymmetric host stall
    # between collectives trips gloo's operation timeout — observed both
    # at first-step and at resume)
    writer.warm()
    if multihost.process_count() > 1:
        # then align every rank before the first training collective
        # (sync also force-initializes the cross-process device-collective
        # context, whose key exchange has a hard ~30 s timeout)
        multihost.sync("pre_train")

    epochs = train_config.get("epochs", 1)
    total_steps = train_config.get("total_steps", -1)
    if total_steps_override is not None:
        total_steps = total_steps_override
    checkpoint_every = train_config.get("checkpoint_every", -1)
    log_every = max(1, int(train_config.get("log_every", 1)))

    key = jax.random.PRNGKey(int(state.step) + 1)
    finished = False
    last_grad_stats = None
    # the step counter lives on HOST — int(state.step) is a device sync
    # per call, and through the TPU tunnel that sync dominated step time
    host_step = int(state.step)
    # metrics of a step are fetched one iteration LATER, after the next
    # step has been dispatched, so the host's device_get overlaps with
    # device compute instead of serializing with it
    pending_metrics = None

    def _process_metrics(step, metrics, epoch):
        nonlocal last_grad_stats, t_last, steps_last
        host_metrics = jax.device_get(metrics)
        last_grad_stats = host_metrics.pop("grad_stats", last_grad_stats)
        scalars = {k: float(v) for k, v in host_metrics.items()}
        scalars["learning_rate"] = float(np.asarray(lr_schedule(step)))
        scalars["epoch"] = epoch
        now = time.time()
        if now > t_last:
            scalars["steps_per_second"] = \
                (step - steps_last) / (now - t_last)
        t_last, steps_last = now, step
        writer.scalars(step, scalars)
        if step - _last_progress["step"] >= 100:
            _last_progress["step"] = step
            logger.info(
                f"step {step}: total "
                f"{scalars.get(TOTAL_LOSS_STR, float('nan')):.3f} "
                f"mae0 "
                f"{scalars.get('scale_0/mae_loss', float('nan')):.3f}")
    t_last, steps_last = time.time(), int(state.step)
    repeat_stream = bool(dataset_config.get("repeat", False))
    _last_progress = {"step": int(state.step)}
    _refresh_marker = {"step": -1}

    def steps_since_print_or_refresh(step_, every=100):
        if step_ - _refresh_marker["step"] >= every:
            _refresh_marker["step"] = step_
            return True
        return False

    # --- preemption safety: SIGTERM/SIGINT → finish the current step,
    # checkpoint, exit cleanly (the reference has no preemption handling,
    # SURVEY §5.3; on TPU pods preemption is routine)
    import signal
    preempted = {"flag": False}

    def _on_signal(signum, frame):
        logger.warning(f"signal {signum}: checkpointing and stopping")
        preempted["flag"] = True

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_signal)
        except ValueError:  # non-main thread
            pass

    try:
      # epochs -1 is epochless (until killed / total_steps); epochs 0 with
      # total_steps > 0 is the step-bounded epochless mode the in-loop
      # deep-supervision ramp already handles — without total_steps it
      # stays a no-op (0 epochs)
      epochless = epochs == -1 or (epochs == 0 and total_steps > 0)
      while not finished and (epochless or int(state.epoch) < epochs):
        epoch = int(state.epoch)
        if epochs not in (-1, 0):
            pct_done = epoch / float(epochs)
        elif total_steps > 0:
            pct_done = min(1.0, int(state.step) / float(total_steps))
        else:
            pct_done = 0.0
        # numpy, not jnp: numpy inputs are placed by the jit's in_shardings
        # on every process, which is the multi-host-safe path for
        # replicated host values
        depth_weights = np.asarray(ds_schedule(pct_done), np.float32)
        logger.info(f"epoch {epoch}: deep-supervision weights "
                    f"{np.round(np.asarray(depth_weights), 3).tolist()}")

        from ..data.prefetch import GroupedBatches, device_prefetch
        from ..parallel.mesh import data_sharding
        batches = device_prefetch(
            GroupedBatches(dataset.training, grad_accum),
            sharding=data_sharding(mesh, spatial=spatial_training),
            prefetch=2,
            # uint8 transfer is lossless when inputs get rounded on device
            transfer_dtype=(
                np.uint8 if dataset_config.get("round_values", True)
                else None))
        profile_at = train_config.get("profile_at_step", -1)
        try:
          for batch_dev in batches:
            key, step_key = jax.random.split(key)

            # repeat-mode / epochless streams never end an epoch, so
            # refresh the deep-supervision ramp from step progress
            # periodically (keyed on the stream property, not on epochs)
            if (total_steps > 0 and steps_since_print_or_refresh(host_step)
                    and (repeat_stream or epochs in (-1, 0))):
                pct_done = min(1.0, host_step / float(total_steps))
                depth_weights = np.asarray(ds_schedule(pct_done),
                                           np.float32)

            # the stats variant runs only when this step's gradients feed
            # the boxplot figures below
            is_viz_step = (eval_batch is not None and visualization_every > 0
                           and (host_step + 1) % visualization_every == 0)
            step_fn = stats_step if (stats_step is not None and is_viz_step) \
                else train_step

            if profile_at > 0 and host_step + 1 == profile_at:
                # one-shot device trace of a REGULAR training step
                # (reference's step-0 graph trace analog,
                # train_loop.py:323-338) — profiling must observe, not
                # re-apply a batch
                from .profiling import trace
                with trace(os.path.join(str(ckpt_dir), "profile")):
                    state, metrics = step_fn(state, batch_dev, step_key,
                                             depth_weights)
                    # device_get truly blocks; block_until_ready returns
                    # EARLY through the axon tunnel (CLAUDE.md) and would
                    # stop the trace before the step executed
                    float(np.asarray(jax.device_get(
                        metrics[TOTAL_LOSS_STR])))
            else:
                state, metrics = step_fn(state, batch_dev, step_key,
                                         depth_weights)
            host_step += 1
            step = host_step

            # metrics of the PREVIOUS logged step: its device_get (one per
            # dict — per-scalar float() costs a round trip each) now
            # overlaps with the step just dispatched above
            if pending_metrics is not None:
                _process_metrics(*pending_metrics)
                pending_metrics = None
            # viz steps are always processed — their metrics carry the
            # grad_stats the figures consume
            if step % log_every == 0 or is_viz_step:
                pending_metrics = (step, metrics, epoch)

            # periodic noise-sweep evaluation + weight stats/figures
            if (eval_batch is not None and visualization_every > 0
                    and step % visualization_every == 0):
                # flush so the figures reflect THIS step's gradients
                if pending_metrics is not None:
                    _process_metrics(*pending_metrics)
                    pending_metrics = None
                # evaluate the weights that ship: the EMA when tracked
                eval_view = state if state.ema_params is None \
                    else state.replace(params=state.ema_params)
                _noise_sweep_eval(eval_step, eval_view, eval_batch, writer,
                                  step,
                                  max_images=int(train_config.get(
                                      "visualization_number", 4)))
                # figure/stat building is pure host work whose writes are
                # no-ops off the primary — don't duplicate it N-1 times
                # (the sweep above runs everywhere: it computes on device)
                if multihost.is_primary():
                    _weight_stats(state, writer, step)
                    _weight_figures(state, writer, step)
                    _gradient_figures(last_grad_stats, writer, step)

            if checkpoint_every > 0 and step % checkpoint_every == 0:
                manager.save(state, force=True)

            if preempted["flag"] or (total_steps > 0 and step >= total_steps):
                finished = True
                break
        finally:
            # stop the prefetch producer + dataset workers promptly on
            # early exit (total_steps / preemption)
            batches.close()
            if pending_metrics is not None:
                try:
                    _process_metrics(*pending_metrics)
                except Exception as e:  # pragma: no cover — device died
                    logger.warning(f"final metrics fetch failed: {e}")
                pending_metrics = None

        if not preempted["flag"]:
            # a preemption (SIGTERM/SIGINT) break mid-epoch must NOT
            # advance the epoch counter: resume has to continue inside the
            # interrupted epoch, not silently skip its remainder (per-epoch
            # pruning below is skipped for the same reason). A total_steps
            # exit still counts the epoch complete — the step bound IS the
            # configured end of training.
            state = state.replace(epoch=state.epoch + 1)

        # optional per-epoch weight pruning (train.prune). The reference
        # ships the pruning strategies but never invokes them from its
        # loop (its pruning.py is orphaned); here the documented config
        # schema actually works: prune on the host, continue training.
        prune_cfg = train_config.get("prune")
        if not preempted["flag"] and prune_cfg \
                and prune_cfg.get("strategy", "NONE") != "NONE" \
                and int(state.epoch) % int(prune_cfg.get(
                    "every_epochs", 1)) == 0:
            from ..pruning import prune_function_builder, prune_params
            from ..parallel.multihost import broadcast_from_primary, to_host
            prune_fn = prune_function_builder(prune_cfg)
            pruned = prune_params(to_host(state.params), prune_fn)
            # the shipped strategies are deterministic (seeded RNG, full
            # SVD), but only the primary's values are authoritative: a
            # future non-deterministic strategy must not silently
            # desynchronize ranks
            pruned = broadcast_from_primary(pruned)
            state = state.replace(params=pruned)
            if state.ema_params is not None:
                # the average must honor the same sparsity, or export (which
                # prefers EMA) would undo the prune
                pruned_ema = broadcast_from_primary(
                    prune_params(to_host(state.ema_params), prune_fn))
                state = state.replace(ema_params=pruned_ema)
            logger.info(f"epoch {int(state.epoch)}: pruned weights "
                        f"({prune_cfg.get('strategy')})")

        manager.save(state, force=True)
    finally:
        # always checkpoint/flush/restore handlers — including when a
        # pipeline error propagates out of the loop
        manager.save(state, force=True)
        manager.wait()
        writer.close()
        for sig, handler in prev_handlers.items():
            signal.signal(sig, handler)
    return state


def _noise_sweep_eval(eval_step, state: TrainState, eval_batch: jnp.ndarray,
                      writer: MetricsWriter, step: int,
                      max_images: int = 4):
    """Fixed-image sweep at std ∈ {0,20,40,60,80}
    (reference train_loop.py:507-529). Scalars/histograms use the whole
    batch; image grids are capped at ``max_images`` (the reference's
    train.visualization_number)."""
    key = jax.random.PRNGKey(0)
    for std in EVAL_NOISE_STDS:
        noisy = corrupt_batch_fixed_std(key, eval_batch, std=std) \
            if std > 0 else eval_batch
        denoised = eval_step(state, noisy)
        error = np.asarray(denoised) - np.asarray(eval_batch)
        writer.scalars(step, {
            f"eval/mae_noise_{int(std)}": float(mae(eval_batch, denoised)),
            f"eval/psnr_noise_{int(std)}": float(psnr(eval_batch, denoised)),
        })
        # error / noise distributions (reference train_loop.py:462-504)
        writer.histogram(step, f"eval/error_noise_{int(std)}", error)
        if std > 0:
            writer.histogram(step, f"eval/noise_{int(std)}",
                             np.asarray(noisy) - np.asarray(eval_batch))
        # denoised grid at every sweep std (reference multi-std image
        # grids); noisy + error images once at a representative std
        writer.images(step, f"eval/denoised_noise_{int(std)}",
                      np.asarray(denoised)[:max_images])
        if std == EVAL_NOISE_STDS[1]:
            writer.images(step, "eval/noisy",
                          np.asarray(noisy)[:max_images])
            # per-pixel error image, scaled to visible range
            writer.images(step, "eval/error",
                          np.clip(np.abs(error[:max_images]) * 4.0, 0, 255))


def _weight_figures(state: TrainState, writer: MetricsWriter, step: int):
    """Weight boxplot + histogram heatmap figures (reference
    visualize.py:168-328 → TB), when matplotlib + TB are available."""
    from ..visualize import weights_boxplot, weights_heatmap
    fig = weights_boxplot(state.params)
    if fig is not None:
        writer.figure(step, "weights/boxplot", fig)
    fig = weights_heatmap(state.params)
    if fig is not None:
        writer.figure(step, "weights/heatmap", fig)


def _gradient_figures(grad_stats, writer: MetricsWriter, step: int):
    """Gradient boxplot figure + per-tensor median scalars from the
    five-number summaries the jitted step emitted (reference
    train_loop.py:532-541, visualize.py:96-163 — there the raw gradients
    are host-side; here only the summaries leave the device)."""
    if not grad_stats:
        return
    from ..visualize import boxplot_from_stats
    fig = boxplot_from_stats(grad_stats, title="gradients")
    if fig is not None:
        writer.figure(step, "gradients/boxplot", fig)
    writer.scalars(step, {
        f"gradients/{path}/p50": float(np.asarray(q)[2])
        for path, q in grad_stats.items()})


def _weight_stats(state: TrainState, writer: MetricsWriter, step: int):
    """Per-layer weight statistics (the JSONL analog of the reference's
    weight boxplots, visualize.py:168-234)."""
    import flax
    flat = flax.traverse_util.flatten_dict(state.params, sep="/")
    stats = {}
    for path, w in flat.items():
        if "kernel" in path:
            w = np.asarray(w)
            stats[f"weights/{path}/rms"] = float(np.sqrt(np.mean(w ** 2)))
    # keep the record bounded: log aggregate too
    all_w = np.concatenate([np.asarray(w).ravel()
                            for w in flat.values()]) if flat else np.zeros(1)
    stats["weights/global_rms"] = float(np.sqrt(np.mean(all_w ** 2)))
    writer.scalars(step, stats)
