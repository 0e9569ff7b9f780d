"""Background-thread prefetching for host-side input work.

The training input path does real host work per batch — JPEG decode, the
on-device preprocess dispatch, greedy packing, padded-batch assembly — which
the reference hides behind DataLoader workers (reference main.py:175-181,
num_workers).  The TPU-native loop runs one jitted step per batch; without
overlap the chip idles while the host packs.  `prefetch` drains the source
iterator on a background thread into a bounded queue so host work for batch
i+1 overlaps device execution of batch i.

Shutdown is cooperative: when the consumer stops early (max_iters break),
the generator's finally sets a stop event, drains the queue so a blocked
put() releases, and joins the worker — killing a thread mid-device-call at
interpreter teardown aborts the process ('FATAL: exception not rethrown'
from the runtime), observed on the axon backend.

Exceptions raised by the source propagate to the consumer at the point of
`next()`; a sentinel marks exhaustion.  `buffer_size` bounds host memory
(packed batches are a few MB each).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_DONE = object()


class _Failure:
    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch(source: Iterable[T], buffer_size: int = 2) -> Iterator[T]:
    """Iterate `source` on a background thread, `buffer_size` items ahead."""
    q: "queue.Queue" = queue.Queue(maxsize=max(buffer_size, 1))
    stop = threading.Event()

    def _put(item) -> bool:
        """Blocking put that aborts when the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in source:
                if not _put(item):
                    return
        except BaseException as e:  # propagate to the consumer
            _put(_Failure(e))
            return
        _put(_DONE)

    t = threading.Thread(target=worker, daemon=True, name="batch-prefetch")
    t.start()

    try:
        while True:
            item = q.get()
            if item is _DONE:
                return
            if isinstance(item, _Failure):
                raise item.exc
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        # The worker is usually bounded by one in-flight item, but that item
        # can be a remote compile (60-240 s on the axon tunnel).  Join in
        # short slices so a Ctrl-C'd consumer isn't silently stuck for
        # minutes, warn while waiting, and register a final join at exit —
        # a daemon thread killed mid-device-call at interpreter teardown
        # aborts the process on the remote backend.
        deadline = 300.0
        waited = 0.0
        while t.is_alive() and waited < deadline:
            t.join(timeout=15.0)
            waited += 15.0
            if t.is_alive() and waited in (15.0, 60.0, 120.0, 240.0):
                print(
                    f"[prefetch] waiting on worker shutdown ({waited:.0f}s — "
                    "likely blocked in a slow source next(), e.g. a remote compile)"
                )
        if t.is_alive():
            print(
                "[prefetch] WARNING: worker did not stop within "
                f"{deadline:.0f}s; registering a final join at interpreter "
                "exit (a daemon thread dying mid-device-call aborts the process)"
            )
            import atexit

            atexit.register(t.join, 60.0)
