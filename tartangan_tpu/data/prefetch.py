"""Host->device double-buffered batch pipeline.

The reference's hot loop blocks on a synchronous ``imgs.to(device)`` every
batch (trainers/cnn.py:109). Here a background thread assembles the *next*
uint8 batch and starts its async ``device_put`` while the current step runs,
so the TPU never waits on the host for steady-state training.
"""
from __future__ import annotations

import queue
import threading

import numpy as np


class EpochBatcher:
    """Shuffled, drop-last batch index stream over a dataset with a
    ``batch(indices, rng) -> np.uint8[N,H,W,C]`` method."""

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 shuffle: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.shuffle = shuffle

    def __len__(self):
        return len(self.dataset) // self.batch_size

    def epoch(self):
        n = len(self.dataset)
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        for start in range(0, n - self.batch_size + 1, self.batch_size):
            yield self.dataset.batch(
                order[start:start + self.batch_size], self.rng
            )


def prefetch_to_device(iterator, put_fn, depth: int = 2):
    """Wrap a host-batch iterator: apply ``put_fn`` (device_put with the
    right sharding) ``depth`` batches ahead, using a worker thread."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def producer():
        try:
            for batch in iterator:
                q.put(put_fn(batch))
        finally:
            q.put(_END)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
