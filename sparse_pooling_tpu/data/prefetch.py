"""Double-buffered host -> device input pipeline.

The reference's hot loop is host-bound: ``feed_dict`` rebuilds BEV maps and
sparse matrices in numpy and re-uploads them every ``sess.run`` (SURVEY.md
§4.1). Here the host work is only file IO + resize + pad (``data.dataset``),
and this module overlaps it with device compute: a worker thread loads and
``jax.device_put``s batch n+1..n+depth while the device runs batch n. With
the ~0.3 GB/s tunneled transfer measured on this host, overlap hides the
~3 ms/frame upload entirely.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Iterator, Optional

import jax


class DevicePrefetcher:
    """Wrap a host batch iterator; yields device-resident batches.

    Consumers that stop early (the Trainer breaks at max_steps every run)
    MUST call :meth:`close` (or use the context manager) — otherwise the
    worker thread stays blocked on ``Queue.put`` holding ``depth``
    device-resident batches for the process lifetime.
    """

    def __init__(
        self,
        host_iter: Iterator,
        depth: int = 2,
        transform: Optional[Callable] = None,
        sharding=None,
    ):
        self._iter = host_iter
        self._transform = transform
        self._sharding = sharding
        # worker-side phase accumulators (seconds): host-iterator pull vs
        # device_put — read after close() to attribute pipeline stalls
        self.timings = {"load": 0.0, "put": 0.0}
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        """Enqueue unless closed; returns False once the consumer is gone."""

        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.05)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self):
        try:
            it = iter(self._iter)
            while True:
                t0 = time.perf_counter()
                try:
                    item = next(it)
                except StopIteration:
                    break
                self.timings["load"] += time.perf_counter() - t0
                if self._stop.is_set():
                    return
                if self._transform is not None:
                    item = self._transform(item)
                arrays, meta = item
                t0 = time.perf_counter()
                arrays = jax.tree.map(self._place, arrays)
                self.timings["put"] += time.perf_counter() - t0
                if not self._put((arrays, meta)):
                    return
        except BaseException as e:  # surface loader errors to the consumer
            self._err = e
        finally:
            self._put(self._done)

    def _place(self, x):
        """Device-put one leaf under the configured sharding.

        Multi-host (``jax.distributed``): every process loads the SAME
        global batch (the dataset iterator is seed-deterministic), and
        each contributes only its addressable shards — the standard
        multi-controller pattern (SURVEY.md §3.9 DCN row).
        """

        s = self._sharding
        if s is None:
            return jax.device_put(x)
        if jax.process_count() > 1 and hasattr(s, "devices_indices_map"):
            pid = jax.process_index()
            imap = s.devices_indices_map(x.shape)
            shards = [
                jax.device_put(x[idx], d)
                for d, idx in imap.items()
                if d.process_index == pid
            ]
            return jax.make_array_from_single_device_arrays(x.shape, s, shards)
        return jax.device_put(x, s)

    def close(self, timeout: float = 5.0):
        """Stop the worker and release its queued device batches.

        Idempotent; safe to call mid-iteration or after exhaustion. Drains
        the queue so a ``put``-blocked worker can observe the stop flag.
        """

        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
