"""Host-side prefetching: overlap feature extraction with device compute.

The reference's generator runs synchronously inside ``model.fit`` on a
single thread (``Proposed_Work_Results.py:36-37``), so the GPU idles
during feature extraction.  Here a background thread keeps a small queue
of ready batches and transfers them to the device (``jax.device_put``)
ahead of use — classic double buffering, the input-pipeline design
SURVEY.md §2.5 calls for.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax


class DevicePrefetcher:
    """Wrap host batch iterator(s); yields device-resident batches.

    Pass a list of independent iterators (e.g. several
    ``BalancedBatcher``s with different seeds) to overlap multiple host
    pipelines — the native kernels release the GIL, so workers overlap
    genuinely.  Each iterator gets its own thread; batches interleave in
    completion order.
    """

    _SENTINEL = object()

    def __init__(self, iterator, buffer_size: int = 2,
                 max_batches: int | None = None, device=None):
        iterators = iterator if isinstance(iterator, (list, tuple)) \
            else [iterator]
        self.max_batches = max_batches
        self.device = device
        self.q: queue.Queue = queue.Queue(
            maxsize=max(buffer_size, len(iterators)))
        self.error = None
        self._closed = False
        self._count_lock = threading.Lock()
        self._count = 0
        self.threads = [threading.Thread(target=self._worker, args=(it,),
                                         daemon=True) for it in iterators]
        self._live = len(self.threads)
        for t in self.threads:
            t.start()

    def _take_slot(self) -> bool:
        if self.max_batches is None:
            return True
        with self._count_lock:
            if self._count >= self.max_batches:
                return False
            self._count += 1
            return True

    def _put(self, item) -> bool:
        """Bounded put that gives up once the consumer closed us."""
        while not self._closed:
            try:
                self.q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self, iterator):
        try:
            for batch in iterator:
                if self._closed or not self._take_slot():
                    break
                if not self._put(jax.device_put(batch, self.device)):
                    break
        except Exception as e:  # surfaced on the consumer side
            self.error = e
        finally:
            with self._count_lock:
                self._live -= 1
                if self._live == 0:
                    self._put(self._SENTINEL)

    def close(self):
        """Stop the workers; safe to call multiple times.  Without this
        a finished-with prefetcher's threads would block forever on the
        full queue (they are daemons, but they pin batch memory)."""
        self._closed = True
        while True:
            try:
                self.q.get_nowait()
            except queue.Empty:
                break

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is self._SENTINEL:
            if self.error is not None:
                raise self.error
            raise StopIteration
        return item
