"""Observability tests: metrics writer, step timer, visualization."""

import json
import os

import numpy as np

from blind_image_denoising_tpu.training.metrics import MetricsWriter
from blind_image_denoising_tpu.training.profiling import StepTimer, annotate
from blind_image_denoising_tpu.visualize import (
    collage, weights_boxplot, weights_heatmap)


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.scalars(1, {"loss": 1.5, "mae": np.float32(2.5)})
    w.scalars(2, {"loss": 1.0})
    w.text(1, "config", "{}")
    w.close()
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert recs[0]["step"] == 1 and recs[0]["loss"] == 1.5
    assert recs[0]["mae"] == 2.5
    assert recs[1]["loss"] == 1.0


def test_step_timer():
    t = StepTimer(images_per_step=16, n_devices=2)
    assert t.update(0) == {}
    out = t.update(10)
    assert out["steps_per_second"] > 0
    assert out["images_per_second"] == out["steps_per_second"] * 16
    assert out["images_per_second_per_chip"] == out["images_per_second"] / 2


def test_annotate_context():
    with annotate("test_phase"):
        pass


def test_collage_tiles():
    batch = np.arange(4 * 2 * 3 * 1).reshape(4, 2, 3, 1).astype(np.float32)
    tiled = collage(batch)
    assert tiled.shape == (4, 6, 1)  # 2x2 grid of 2x3 tiles


def test_weight_figures():
    params = {"layer": {"kernel": np.random.default_rng(0)
                        .normal(size=(3, 3, 4, 8)).astype(np.float32)}}
    fig = weights_boxplot(params)
    hm = weights_heatmap(params)
    # matplotlib may be absent; both None is acceptable then
    assert (fig is None) == (hm is None)
