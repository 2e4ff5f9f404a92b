"""Host->device training data feed.

Replaces the reference's NonDetMultiThreadedAugmenter worker processes
(`nnUNetTrainer.py:796-819`) with a thread that runs the host-side PatchSampler and
stages batches onto the device (optionally sharded over a mesh), while the
jitted augmentation + train step run on-device. Double buffering keeps the
accelerator fed.
"""

import queue
import threading
from typing import Optional

import jax
import numpy as np


class DevicePrefetcher:
    """Pulls numpy batches from `sampler`, transfers to device, keeps `buffer_size`
    batches in flight. Call `next()` for a device-resident batch dict."""

    def __init__(self, sampler, buffer_size: int = 2, sharding=None):
        self.sampler = sampler
        self.sharding = sharding
        self._queue = queue.Queue(maxsize=buffer_size)
        self._stop = threading.Event()
        self._exc = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _transfer(self, batch: dict) -> dict:
        from ..parallel.mesh import make_global_batch
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                # multi-host: v is this process's slice of the global batch;
                # make_global_batch assembles the globally-sharded array
                out[k] = (make_global_batch(self.sharding, v)
                          if self.sharding is not None else jax.device_put(v))
            else:
                out[k] = v
        return out

    def _worker(self):
        try:
            while not self._stop.is_set():
                batch = next(self.sampler)
                device_batch = self._transfer(batch)
                while not self._stop.is_set():
                    try:
                        self._queue.put(device_batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except Exception as e:  # surfaced on next()
            self._exc = e

    def __next__(self):
        while True:
            if self._exc is not None:
                raise self._exc
            try:
                return self._queue.get(timeout=1.0)
            except queue.Empty:
                if not self._thread.is_alive() and self._exc is None:
                    raise RuntimeError("prefetch thread died without an exception")

    def __iter__(self):
        return self

    def stop(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)
