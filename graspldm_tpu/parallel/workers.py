"""Background host batch production (DataLoader-workers equivalent).

The reference hides host-side batch assembly (mesh surface sampling, grasp
selection, augmentation) behind torch DataLoader worker processes +
pin_memory (`grasp_ldm/trainers/trainer.py:175-186`). The TPU rebuild's
equivalent is a THREAD pool: batch assembly is numpy-bound (releases the
GIL), so worker threads overlap it with the device step that the main
thread is dispatching — without the serialization cost of shipping numpy
arrays between processes.

Composition with :func:`graspldm_tpu.parallel.prefetch.prefetch_to_device`:

    pool = BatchWorkerPool(make_iter, num_workers=2)
    batches = prefetch_to_device(pool, size=2, mesh=mesh)

gives the full pipeline: workers assemble host batches ahead of time ->
bounded queue -> non-blocking device_put double-buffer -> device step.

With ``num_workers > 1`` batch ORDER is nondeterministic (whichever worker
finishes first enqueues first), exactly like a multi-worker DataLoader;
per-batch contents stay deterministic for a fixed per-worker seed. Use
``num_workers=1`` (still fully asynchronous) when order matters.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterable, Iterator

__all__ = ["BatchWorkerPool"]


class _WorkerError:
    def __init__(self, exc: BaseException):
        self.exc = exc


_END = object()  # one worker's iterator is exhausted


class BatchWorkerPool:
    """Pull batches from ``num_workers`` background threads.

    Args:
        make_iter: ``(worker_id, num_workers) -> Iterable[batch]``. Called
            once per worker ON its thread. Each worker must own its random
            state (e.g. a dataset ``worker_copy(seed + worker_id)``) —
            the pool never synchronizes item selection across workers.
        num_workers: worker threads (>= 1).
        prefetch: max assembled batches buffered ahead of the consumer.

    Iterating the pool yields batches until every worker's iterator is
    exhausted (forever, for infinite iterators). A worker exception is
    re-raised in the consumer. ``close()`` (or the context manager) stops
    the threads; they also die with the process (daemon=True).
    """

    def __init__(
        self,
        make_iter: Callable[[int, int], Iterable[Dict[str, Any]]],
        num_workers: int = 1,
        prefetch: int = 4,
    ):
        if num_workers < 1:
            raise ValueError(f"num_workers must be >= 1, got {num_workers}")
        self._num_workers = num_workers
        self._q: queue.Queue = queue.Queue(maxsize=max(prefetch, num_workers))
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(
                target=self._run, args=(make_iter, wid), daemon=True,
                name=f"batch-worker-{wid}",
            )
            for wid in range(num_workers)
        ]
        for t in self._threads:
            t.start()

    def _put(self, item) -> bool:
        """Blocking put that aborts when the pool is closed."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _run(self, make_iter, wid: int):
        try:
            for batch in make_iter(wid, self._num_workers):
                if not self._put(batch):
                    return
        except BaseException as e:  # surfaced to the consumer
            self._put(_WorkerError(e))
            return
        self._put(_END)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        ended = 0
        while ended < self._num_workers and not self._stop.is_set():
            item = self._q.get()
            if item is _END:
                ended += 1
                continue
            if isinstance(item, _WorkerError):
                self.close()
                raise item.exc
            yield item

    def close(self):
        self._stop.set()
        # drain so producers blocked on put() observe the stop event
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
