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
    """Wrap a host batch iterator; yields device-resident batches."""

    _SENTINEL = object()

    def __init__(self, iterator: Iterator, buffer_size: int = 2,
                 max_batches: int | None = None, device=None):
        self.iterator = iterator
        self.max_batches = max_batches
        self.device = device
        self.q: queue.Queue = queue.Queue(maxsize=buffer_size)
        self.error = None
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _worker(self):
        try:
            count = 0
            for batch in self.iterator:
                if self.max_batches is not None and count >= self.max_batches:
                    break
                self.q.put(jax.device_put(batch, self.device))
                count += 1
        except Exception as e:  # surfaced on the consumer side
            self.error = e
        finally:
            self.q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is self._SENTINEL:
            if self.error is not None:
                raise self.error
            raise StopIteration
        return item
