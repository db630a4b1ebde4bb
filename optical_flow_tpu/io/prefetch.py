"""Async host->device frame prefetching.

The reference frame loop is strictly sequential — decode blocks compute
(ParallelVideoPyr.cpp:769-903, SURVEY.md P6). Here a background thread
decodes and stages the next frame(s) on device while the current step runs,
so H2D transfer and decode hide under device compute (JAX dispatch is async;
the device queue keeps the chip busy).

Failure semantics (round-5 hardening): an exception in the upstream
iterable (a missing file, a mid-stream decode error) is FORWARDED to the
consumer and re-raised there — it must never read as a clean, truncated
end-of-stream. And a consumer that exits early (break, exception) closes
the generator, which signals the worker: its pending q.put unblocks
within a bounded timeout instead of pinning the thread, the staged
device buffers and the open decoder forever.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax
import numpy as np

_STOP = object()


class _UpstreamError:
    """Queue envelope carrying an exception from the worker thread."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def _run_prefetch(q, closed, produce) -> None:
    """Worker body: enqueue items from produce() with closed-aware puts;
    forward any upstream exception; always terminate the stream."""

    def emit(item) -> bool:
        while not closed.is_set():
            try:
                q.put(item, timeout=0.25)
                return True
            except queue.Full:
                continue
        return False

    try:
        for item in produce():
            if not emit(item):
                return  # consumer gone: drop everything, exit promptly
        emit(_STOP)
    except BaseException as e:  # noqa: BLE001 — forwarded, not swallowed
        emit(_UpstreamError(e))


def _consume(q, closed, produce):
    """Generator over the prefetched stream. The worker thread starts on
    the FIRST next(), not at construction: a generator abandoned before
    iteration never runs a generator's finally, so an eagerly-started
    worker could never be signalled and would spin forever holding the
    decoder and the staged buffers (round-5 meta-review)."""
    t = threading.Thread(
        target=_run_prefetch, args=(q, closed, produce), daemon=True
    )
    t.start()
    try:
        while True:
            item = q.get()
            if item is _STOP:
                break
            if isinstance(item, _UpstreamError):
                raise item.exc
            yield item
    finally:
        closed.set()
        t.join(timeout=10)


def prefetch_to_device(
    frames: Iterable[np.ndarray],
    depth: int = 2,
    device: Optional[jax.Device] = None,
) -> Iterator[jax.Array]:
    """Yield frames as device arrays, decoding/transferring `depth` ahead."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    closed = threading.Event()

    def produce():
        for f in frames:
            yield jax.device_put(np.ascontiguousarray(f), device)

    return _consume(q, closed, produce)


def prefetch_chunks_to_device(
    frames: Iterable[np.ndarray],
    chunk_size: int,
    depth: int = 2,
    device: Optional[jax.Device] = None,
    timings: Optional[list] = None,
) -> Iterator[jax.Array]:
    """Stack frames into (chunk_size, ...) batches and stage them on device
    from a background thread. The final batch may be shorter. One H2D
    transfer per chunk (instead of per frame) is what lets the chunked
    pipeline amortize dispatch + transfer latency over many frames.

    timings: optional list the worker appends per-chunk producer spans
    to — {"decode_s": time pulling the chunk's frames from upstream,
    "put_s": device_put + ready} — so a benchmark can decompose the REAL
    loop with the loop's own clock instead of side probes (an unstable
    link's bandwidth cannot be point-probed fairly; bench.py host_loop)."""
    import time

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    closed = threading.Event()

    def put(buf):
        t0 = time.perf_counter()
        arr = jax.device_put(np.stack(buf), device)
        if timings is not None:
            # sync only when instrumented: the production path keeps
            # transfers in flight (the runtime pipelines queued puts)
            arr.block_until_ready()
        return arr, time.perf_counter() - t0

    def produce():
        buf: list = []
        t_dec0 = time.perf_counter()
        for f in frames:
            buf.append(np.ascontiguousarray(f))
            if len(buf) == chunk_size:
                dec_s = time.perf_counter() - t_dec0
                arr, put_s = put(buf)
                if timings is not None:
                    timings.append({"decode_s": dec_s, "put_s": put_s})
                yield arr
                buf = []
                t_dec0 = time.perf_counter()
        if buf:
            dec_s = time.perf_counter() - t_dec0
            arr, put_s = put(buf)
            if timings is not None:
                timings.append({"decode_s": dec_s, "put_s": put_s})
            yield arr

    return _consume(q, closed, produce)
