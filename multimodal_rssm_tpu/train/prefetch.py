"""Host-side batch prefetcher.

Overlaps chunk sampling / host->device transfer for step k+1 with device
compute for step k (the reference samples synchronously inside its train
step — memory.py:189-209 — serialising host gather with GPU compute).
A single worker thread keeps a bounded queue of device-ready batches;
JAX's async dispatch does the rest.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Optional


class Prefetcher:
    def __init__(self, produce: Callable[[], object], depth: int = 2):
        self._produce = produce
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            while not self._stop.is_set():
                item = self._produce()
                while not self._stop.is_set():
                    try:
                        self._queue.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced on next get()
            self._exc = e

    def get(self):
        while True:
            if self._exc is not None:
                raise self._exc
            try:
                return self._queue.get(timeout=0.1)
            except queue.Empty:
                if not self._thread.is_alive() and self._exc is None:
                    raise RuntimeError("prefetcher thread died")

    def close(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)
