"""Host-side batch loader with threaded prefetch to device.

Replaces the reference's torch DataLoader (workers=8..32, pin_memory,
open-per-item h5py — SURVEY §3.5). Design: a thread pool maps __getitem__
over the batch indices (h5py releases the GIL during reads), batches are
collated in numpy and (optionally) pushed to device asynchronously with
`jax.device_put` while the previous step computes, giving input-pipeline /
compute overlap without a tf.data dependency.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator, Optional, Sequence

import numpy as np


def default_collate(items: Sequence[Any]):
    first = items[0]
    if isinstance(first, dict):
        return {k: default_collate([it[k] for it in items]) for k in first}
    if isinstance(first, tuple):
        return tuple(default_collate(list(col)) for col in zip(*items))
    if isinstance(first, np.ndarray):
        return np.stack(items)
    return np.asarray(items)


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 8,
        drop_last: bool = True,
        seed: int = 0,
        collate_fn: Callable = default_collate,
        prefetch: int = 2,
        device_put: Optional[Callable[[Any], Any]] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self.device_put = device_put
        self.rng = np.random.RandomState(seed)
        self.pool = ThreadPoolExecutor(max_workers=max(1, num_workers)) if num_workers else None

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self) -> Iterator[np.ndarray]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        stop = len(idx) - (len(idx) % self.batch_size) if self.drop_last else len(idx)
        for s in range(0, stop, self.batch_size):
            yield idx[s : s + self.batch_size]

    def _load_batch(self, indices) -> Any:
        if self.pool is not None:
            items = list(self.pool.map(self.dataset.__getitem__, [int(i) for i in indices]))
        else:
            items = [self.dataset[int(i)] for i in indices]
        batch = self.collate_fn(items)
        if self.device_put is not None:
            batch = self.device_put(batch)
        return batch

    def __iter__(self) -> Iterator[Any]:
        batch_iter = self._batches()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for indices in batch_iter:
                    q.put(self._load_batch(indices))
                q.put(sentinel)
            except BaseException as e:  # re-raised on the consumer side
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
