"""Device prefetch: overlap host batch assembly/H2D transfer with device
compute.

The reference relied on tf.data's prefetch(2) (dataset.py:295); here a
daemon thread assembles super-batches and `jax.device_put`s them onto the
mesh ahead of the training step, so the TPU never waits on PIL decode or
numpy stacking.
"""

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax
import numpy as np


def device_prefetch(iterable: Iterable, sharding=None,
                    prefetch: int = 2) -> Iterator:
    """Yield device-resident batches from a host iterable.

    ``sharding``: optional jax.sharding.Sharding to place batches with
    (e.g. the mesh data-sharding); None → default device placement.
    """
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _END = object()

    def producer():
        try:
            for item in iterable:
                arr = jax.device_put(np.ascontiguousarray(item), sharding)
                q.put(arr)
            q.put(_END)
        except BaseException as e:  # surface failures in the consumer
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class GroupedBatches:
    """Group ``grad_accum`` pipeline batches into one super-batch
    (host-side concat), re-iterable per epoch."""

    def __init__(self, dataset_iterable, grad_accum: int):
        self._ds = dataset_iterable
        self._n = max(1, grad_accum)

    def __iter__(self):
        buf = []
        for batch in self._ds:
            buf.append(batch)
            if len(buf) == self._n:
                yield np.concatenate(buf, axis=0) if self._n > 1 else buf[0]
                buf = []
