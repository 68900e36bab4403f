"""Multi-host training: two REAL OS processes joined through the JAX
distributed runtime (parallel/multihost.py), driving the actual train CLI.

This is the multi-controller SPMD path used on real TPU pods — each
process owns a disjoint slice of the global batch and assembles global
arrays with make_array_from_process_local_data — simulated here with the
virtual CPU platform (4 devices per process, 8 global). The reference is
single-process only (SURVEY §2.9)."""

import json
import os
import socket
import subprocess
import sys

import pytest

# subprocess-cohort tests: N real ranks time-slice this machine's single
# core, so they dominate suite wall time -> `slow` tier (pytest.ini)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_CONFIG = {
    "model": {
        "backbone": {
            "type": "unet_laplacian",
            "input_shape": [32, 32, 3],
            "depth": 2, "width": 1, "filters": 8,
            "use_self_attention": False,
            "multiple_scale_outputs": True,
        },
        "denoiser": {"filters": 8, "output_channels": 3},
    },
    "loss": {"hinge": 0.0, "mae_multiplier": 1.0},
    "train": {
        "epochs": -1,
        "total_steps": 3,
        "checkpoint_every": 3,
        "use_test_images": False,
        "gpu_batches_per_step": 2,
        # weight EMA rides along in every multi-host test: the averaged
        # tree must replicate, checkpoint and resume across processes
        # exactly like params (training/train_state.py)
        "ema": 0.9,
        "optimizer": {
            "type": "adam",
            "schedule": {
                "type": "exponential_decay",
                "config": {"learning_rate": 1e-3,
                           "decay_steps": 1000, "decay_rate": 0.9}},
        },
    },
    "dataset": {
        "batch_size": 8,  # GLOBAL batch -> 4 per process
        "input_shape": [32, 32, 3],
        "additional_noise": [5.0],
        "multiplicative_noise": [],
        "repeat": True,
        "inputs": [],
    },
}


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch_ranks(cfg_path, ckpt_dir, tmp_path, n_ranks=2,
                  local_devices=4):
    """Run all ranks to completion; returns (returncodes, outputs)."""
    port = _free_port()
    env = dict(os.environ)
    # each process picks its own virtual device count via
    # --local-device-count; drop the pytest session's 8-device XLA_FLAGS
    env.pop("XLA_FLAGS", None)
    env.pop("PYTHONPATH", None)

    procs = []
    for rank in range(n_ranks):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "blind_image_denoising_tpu.train",
             "--pipeline-config", str(cfg_path),
             "--checkpoint-directory", str(ckpt_dir),
             "--platform", "cpu",
             "--coordinator-address", f"localhost:{port}",
             "--num-processes", str(n_ranks),
             "--process-id", str(rank),
             "--local-device-count", str(local_devices)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    timed_out = False
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            # machine-load flake (CLAUDE.md): kill the whole cohort and
            # report failure codes so callers' bounded retry covers
            # timeouts the same as crashes
            timed_out = True
            for q in procs:
                q.kill()
            out = (p.communicate()[0] or "") + "\n[timed out after 540s]"
        outs.append(out)
        (tmp_path / f"rank{rank}.log").write_text(out)  # post-mortem aid
    rcs = [p.returncode for p in procs]
    if timed_out and not any(rcs):
        rcs[0] = 1  # a rank may have exited 0 before the kill
    return rcs, outs


def _drop_checkpoints_past(ckpt_dir, resume_step: int):
    """Remove (possibly partial) checkpoints a failed resume attempt wrote
    past the resume point, incl. orbax tmp dirs, so a retry restores from
    the intended step."""
    import shutil
    for d in list(ckpt_dir.glob("*")) + list(ckpt_dir.glob("*/*")):
        if d.is_dir() and d.name.split(".")[0].isdigit() \
                and int(d.name.split(".")[0]) > resume_step:
            shutil.rmtree(d, ignore_errors=True)


def _resume_with_retry(cfg_path, ckpt_dir, tmp_path, n_ranks,
                       local_devices, resume_step):
    """Resume-phase launch with one bounded retry: restores the metrics
    sink and drops past-resume checkpoints before retrying, so the retry
    sees exactly the pre-resume state."""
    metrics = ckpt_dir / "metrics.jsonl"
    snapshot = metrics.read_text() if metrics.exists() else None
    rcs, outs = _launch_ranks(cfg_path, ckpt_dir, tmp_path,
                              n_ranks=n_ranks, local_devices=local_devices)
    if any(rcs):
        if snapshot is not None:
            metrics.write_text(snapshot)
        elif metrics.exists():
            metrics.unlink()  # failed attempt created it; retry starts clean
        _drop_checkpoints_past(ckpt_dir, resume_step)
        rcs, outs = _launch_ranks(cfg_path, ckpt_dir, tmp_path,
                                  n_ranks=n_ranks,
                                  local_devices=local_devices)
    return rcs, outs


def _launch_two_ranks(cfg_path, ckpt_dir, tmp_path):
    return _launch_ranks(cfg_path, ckpt_dir, tmp_path, n_ranks=2,
                         local_devices=4)


@pytest.mark.slow
def test_two_process_train(tmp_path):
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(TINY_CONFIG))
    ckpt_dir = tmp_path / "run"

    rcs, outs = _launch_two_ranks(cfg_path, ckpt_dir, tmp_path)
    if any(rcs):
        # distributed init over localhost can flake under heavy machine
        # load (coordinator timeout); one clean retry on a fresh port
        import shutil
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        rcs, outs = _launch_two_ranks(cfg_path, ckpt_dir, tmp_path)
    for rank, (rc, out) in enumerate(zip(rcs, outs)):
        assert rc == 0, \
            f"rank {rank} failed (logs in {tmp_path}):\n{out[-4000:]}"

    # primary-only metrics sink: exactly one writer produced step records
    metrics = ckpt_dir / "metrics.jsonl"
    assert metrics.exists()
    steps = [json.loads(l)["step"] for l in metrics.read_text().splitlines()]
    assert 3 in steps
    assert sorted(set(steps)) == sorted(steps), "duplicate metric records — " \
        "non-primary process wrote to the shared sink"

    # the global mesh spanned both processes' devices
    assert any("over 8 devices" in o for o in outs[:1]), outs[0][-2000:]

    # checkpoint was written (orbax coordinates the shared directory)
    import glob
    assert glob.glob(str(ckpt_dir / "3" / "**"), recursive=True) or \
        glob.glob(str(ckpt_dir / "**" / "3"), recursive=True), \
        f"no step-3 checkpoint under {ckpt_dir}"

    # --- multi-host RESUME: relaunch both ranks against the same
    # checkpoint directory with a higher step budget; every process must
    # restore step 3 and continue to 5 (pod preemption-recovery path)
    cfg2 = dict(TINY_CONFIG)
    cfg2["train"] = dict(TINY_CONFIG["train"], total_steps=5,
                         checkpoint_every=5)
    cfg_path.write_text(json.dumps(cfg2))
    rcs, outs = _resume_with_retry(cfg_path, ckpt_dir, tmp_path,
                                   n_ranks=2, local_devices=4,
                                   resume_step=3)
    for rank, (rc, out) in enumerate(zip(rcs, outs)):
        assert rc == 0, \
            f"resume rank {rank} failed (logs in {tmp_path}):\n{out[-4000:]}"
    assert any("restored checkpoint step 3" in o for o in outs), \
        outs[0][-1500:]
    steps = [json.loads(l)["step"] for l in metrics.read_text().splitlines()]
    assert 5 in steps and steps.count(5) == 1


@pytest.mark.slow
def test_four_process_train_and_resume(tmp_path):
    """Multi-host breadth (VERDICT r2 #8): 4 processes x 2 devices —
    train to step 3, then relaunch all four ranks against the same
    checkpoint directory and continue to step 5 (pod preemption
    recovery at 4-way process parallelism). One bounded retry covers the
    documented coordinator-init load flake."""
    cfg = json.loads(json.dumps(TINY_CONFIG))
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    ckpt_dir = tmp_path / "run"

    rcs, outs = _launch_ranks(cfg_path, ckpt_dir, tmp_path,
                              n_ranks=4, local_devices=2)
    if any(rcs):
        import shutil
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        rcs, outs = _launch_ranks(cfg_path, ckpt_dir, tmp_path,
                                  n_ranks=4, local_devices=2)
    for rank, (rc, out) in enumerate(zip(rcs, outs)):
        assert rc == 0, \
            f"rank {rank} failed (logs in {tmp_path}):\n{out[-4000:]}"
    assert any("over 8 devices" in o for o in outs[:1]), outs[0][-2000:]

    cfg["train"] = dict(cfg["train"], total_steps=5, checkpoint_every=5)
    cfg_path.write_text(json.dumps(cfg))
    rcs, outs = _resume_with_retry(cfg_path, ckpt_dir, tmp_path,
                                   n_ranks=4, local_devices=2,
                                   resume_step=3)
    for rank, (rc, out) in enumerate(zip(rcs, outs)):
        assert rc == 0, \
            f"resume rank {rank} failed (logs in {tmp_path}):\n{out[-4000:]}"
    assert any("restored checkpoint step 3" in o for o in outs), \
        outs[0][-1500:]
    metrics = ckpt_dir / "metrics.jsonl"
    steps = [json.loads(l)["step"] for l in metrics.read_text().splitlines()]
    assert 5 in steps and steps.count(5) == 1


@pytest.mark.slow
def test_two_process_spatial_training(tmp_path):
    """Multi-host SPATIALLY-PARALLEL training (VERDICT r2 #5): 2 processes
    x 4 devices, mesh (data 4, spatial 2) — the global batch assembles
    over 'data' across hosts while each crop's H dim shards over
    'spatial' (GSPMD halo exchange across the host boundary). The 4K-on-
    pods scenario, simulated on the virtual CPU platform."""
    cfg = json.loads(json.dumps(TINY_CONFIG))
    cfg["tpu"] = {"mesh": {"spatial": 2, "spatial_training": True}}
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    ckpt_dir = tmp_path / "run"

    rcs, outs = _launch_two_ranks(cfg_path, ckpt_dir, tmp_path)
    if any(rcs):
        import shutil
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        rcs, outs = _launch_two_ranks(cfg_path, ckpt_dir, tmp_path)
    for rank, (rc, out) in enumerate(zip(rcs, outs)):
        assert rc == 0, \
            f"rank {rank} failed (logs in {tmp_path}):\n{out[-4000:]}"
    assert any("spatially-sharded training" in o for o in outs), \
        outs[0][-2000:]
    assert any("'spatial': 2" in o for o in outs), outs[0][-2000:]
    metrics = ckpt_dir / "metrics.jsonl"
    steps = [json.loads(l)["step"] for l in metrics.read_text().splitlines()]
    assert 3 in steps


def test_epoch_bounded_file_dataset_rejected(tmp_path, monkeypatch):
    """Multi-host + non-repeat file datasets must raise the steps-based
    contract error (per-host shards desynchronize batch counts) instead
    of deadlocking at a stranded collective."""
    import pytest
    from blind_image_denoising_tpu.parallel import multihost
    from blind_image_denoising_tpu.training import train_loop as tl

    # train_loop imports the multihost module at call time, so patching
    # the module attribute covers it
    monkeypatch.setattr(multihost, "process_count", lambda: 2)

    cfg = json.loads(json.dumps(TINY_CONFIG))
    cfg["dataset"]["repeat"] = False
    cfg["dataset"]["inputs"] = [{"directory": str(tmp_path)}]
    with pytest.raises(ValueError, match="repeat"):
        tl.train_loop(cfg, tmp_path / "ckpt")


def test_multihost_clamped_mesh_must_span_all_processes(
        tmp_path, monkeypatch):
    """A global batch too small for the device count silently shrinks the
    data axis (gcd clamp) — in multi-host that would drop whole processes
    from the mesh (jax.devices() is process-major) and strand their
    collectives. Must be a descriptive config error instead."""
    import pytest
    from blind_image_denoising_tpu.parallel import multihost
    from blind_image_denoising_tpu.training import train_loop as tl

    monkeypatch.setattr(multihost, "process_count", lambda: 2)

    cfg = json.loads(json.dumps(TINY_CONFIG))
    # global batch 4 on 8 virtual devices -> data clamped 8 -> 4:
    # mesh covers 4 of 8 devices = only "process 0"
    cfg["dataset"]["batch_size"] = 4
    with pytest.raises(ValueError, match="covers 4 of 8"):
        tl.train_loop(cfg, tmp_path / "ckpt")
