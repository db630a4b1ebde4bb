"""Async host->device frame prefetching.

The reference frame loop is strictly sequential — decode blocks compute
(ParallelVideoPyr.cpp:769-903, SURVEY.md P6). Here a background thread
decodes and stages the next frame(s) on device while the current step runs,
so H2D transfer and decode hide under device compute (JAX dispatch is async;
the device queue keeps the chip busy).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax
import numpy as np


def prefetch_to_device(
    frames: Iterable[np.ndarray],
    depth: int = 2,
    device: Optional[jax.Device] = None,
) -> Iterator[jax.Array]:
    """Yield frames as device arrays, decoding/transferring `depth` ahead."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()

    def worker():
        try:
            for f in frames:
                q.put(jax.device_put(np.ascontiguousarray(f), device))
        finally:
            q.put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            break
        yield item
    t.join()
