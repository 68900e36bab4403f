"""Profiling / tracing utilities.

TPU equivalent of the reference's one-shot TensorBoard graph trace and
steps/sec scalars (reference train_loop.py:323-338,566-580):

* :func:`trace` — context manager around ``jax.profiler`` producing a
  Perfetto/TensorBoard-loadable trace directory for a window of steps.
* :func:`annotate` — named TraceAnnotation for host-side phases.
* :class:`StepTimer` — steps/sec + images/sec/chip accounting.
"""

import contextlib
import time
from typing import Optional

import jax

from ..logger import logger


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    logger.info(f"profiler trace started → {log_dir}")
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written → {log_dir}")


def annotate(name: str):
    """Named annotation visible in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Steps/sec and images/sec/chip over a sliding window."""

    def __init__(self, images_per_step: int, n_devices: Optional[int] = None):
        self._images = images_per_step
        self._devices = n_devices or jax.device_count()
        self._t0 = time.perf_counter()
        self._steps0 = None

    def update(self, step: int) -> dict:
        now = time.perf_counter()
        if self._steps0 is None:
            self._steps0, self._t0 = step, now
            return {}
        dt = max(now - self._t0, 1e-9)
        dsteps = step - self._steps0
        self._steps0, self._t0 = step, now
        sps = dsteps / dt
        return {
            "steps_per_second": sps,
            "images_per_second": sps * self._images,
            "images_per_second_per_chip": sps * self._images / self._devices,
        }
