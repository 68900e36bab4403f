"""Training observability: JSONL metrics log + optional TensorBoard.

Equivalent of the reference's TensorBoard summaries
(reference train_loop.py:136-138,439-580). The primary sink is an
append-only ``metrics.jsonl`` (robust, dependency-free, machine-readable);
TensorBoard scalars/images are written too when a SummaryWriter
implementation is importable (torch.utils.tensorboard).
"""

import json
import os
import time
from typing import Dict, Optional

import numpy as np

from ..logger import logger


class MetricsWriter:
    def __init__(self, directory: str, enabled: bool = True):
        """``enabled=False`` turns every write into a no-op — used by
        non-primary processes in multi-host training (parallel/multihost.py)
        so only one process owns the JSONL/TensorBoard sinks."""
        self._enabled = enabled
        self._file = None
        self._tb = None
        self._tb_dir = directory
        self._tb_tried = False
        self._pending_text = []
        if not enabled:
            return
        os.makedirs(directory, exist_ok=True)
        self._path = os.path.join(directory, "metrics.jsonl")
        self._file = open(self._path, "a")

    @property
    def _tensorboard(self):
        """TB writer, created on FIRST use: importing torch costs tens of
        seconds on a cold cache. Multi-host training must pay that stall
        at a rank-aligned point — the train loop calls ``warm()`` before
        its pre-train barrier — because a >30 s primary-only host stall
        between collectives trips gloo's operation timeout on the other
        ranks (observed: resume-phase rank 1 DEADLINE_EXCEEDED while
        rank 0 imported torch)."""
        if not self._tb_tried:
            self._tb_tried = True
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=self._tb_dir)
            except Exception:
                logger.info("tensorboard writer unavailable; JSONL only")
            if self._tb is not None:
                for step, tag, content in self._pending_text:
                    self._tb.add_text(tag, content, step)
            self._pending_text.clear()
        return self._tb

    def warm(self):
        """Pay the TensorBoard/torch import cost NOW (multi-host: call at
        a rank-aligned point, see _tensorboard)."""
        if self._enabled:
            _ = self._tensorboard

    def scalars(self, step: int, values: Dict[str, float],
                prefix: str = ""):
        if not self._enabled:
            return
        rec = {"step": int(step), "time": time.time()}
        tb = self._tensorboard
        for k, v in values.items():
            key = f"{prefix}{k}" if prefix else k
            rec[key] = float(np.asarray(v))
            if tb is not None:
                tb.add_scalar(key, rec[key], int(step))
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()

    def text(self, step: int, tag: str, content: str):
        if not self._enabled:
            return
        if not self._tb_tried:
            # don't trigger the torch import for a text record — queue it
            # until another write constructs the TB writer
            self._pending_text.append((int(step), tag, content))
            return
        if self._tb is not None:
            self._tb.add_text(tag, content, int(step))

    def images(self, step: int, tag: str, batch: np.ndarray):
        """[B, H, W, C] float in [0, 255]."""
        tb = self._tensorboard if self._enabled else None
        if tb is None:
            return
        imgs = np.clip(np.asarray(batch), 0, 255).astype(np.uint8)
        tb.add_images(tag, imgs, int(step), dataformats="NHWC")

    def figure(self, step: int, tag: str, fig):
        tb = self._tensorboard if self._enabled else None
        if tb is not None:
            tb.add_figure(tag, fig, int(step))

    def histogram(self, step: int, tag: str, values: np.ndarray,
                  max_samples: int = 100_000):
        """Value-distribution histogram (reference train_loop.py:462-504
        error/noise histograms). Full histogram goes to TB; the JSONL
        record keeps a percentile summary."""
        if not self._enabled:
            return
        flat = np.asarray(values).ravel()
        if flat.size > max_samples:  # bound TB payload
            flat = flat[:: flat.size // max_samples + 1]
        tb = self._tensorboard
        if tb is not None:
            tb.add_histogram(tag, flat, int(step))
        p = np.percentile(flat, [1, 25, 50, 75, 99])
        self.scalars(step, {f"{tag}/p{q}": float(v)
                            for q, v in zip((1, 25, 50, 75, 99), p)})

    def close(self):
        if self._file is not None:
            self._file.close()
        if self._pending_text:
            # a run that only wrote text (e.g. crashed before the first
            # scalar) must not silently drop it
            _ = self._tensorboard
        if self._tb is not None:
            self._tb.close()
