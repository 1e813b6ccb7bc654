"""Host-side batch loader with threaded or process-pool prefetch to device.

Replaces the reference's torch DataLoader (workers=8..32, pin_memory,
open-per-item h5py — SURVEY §3.5). Two worker modes:

- ``worker_type="thread"`` (default): a thread pool maps __getitem__ over
  the batch indices (h5py releases the GIL during reads), batches are
  collated in numpy and (optionally) pushed to device asynchronously,
  giving input-pipeline / compute overlap without a tf.data dependency.
- ``worker_type="process"``: one forked worker process builds each whole
  batch (like torch's worker-per-batch model). The GIL-bound parts of the
  pipeline — cv2 augmentation, gray→RGB conversion, collation — scale
  across cores this way; measured on the 1 GB KTH-scale store
  (scripts/bench_loader.py) the threaded loader tops out ~530 AE
  pairs/s while the AE train step consumes ~400/s at batch 100, i.e.
  stage-1 training is data-bound without this mode. Workers re-seed the
  dataset's RandomState and the stdlib `random` module per batch from the
  loader seed + batch counter, so augmentations are decorrelated across
  workers yet reproducible. Exceptions propagate to the consumer via
  `Pool.imap`. Requires fork (Linux); falls back to threads elsewhere.
"""
from __future__ import annotations

import multiprocessing
import os
import queue
import random as _stdlib_random
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


# ---- process-worker plumbing (module level so fork children see it) ----
_WORKER_DATASET = None
_WORKER_COLLATE = None


def _reseed_chain(ds, seed: int) -> None:
    """Reseed `rng` RandomStates along a dataset wrapper chain (e.g.
    DatasetRepeater -> TwoFramesDataset) plus the stdlib `random` used by
    the augmentation pipeline."""
    _stdlib_random.seed(seed)
    np.random.seed(seed % (2**32))
    seen = set()
    while ds is not None and id(ds) not in seen:
        seen.add(id(ds))
        if hasattr(ds, "rng") and isinstance(ds.rng, np.random.RandomState):
            ds.rng = np.random.RandomState(seed % (2**32))
        ds = getattr(ds, "dataset", None)


def _process_worker_init(dataset, collate_fn):
    global _WORKER_DATASET, _WORKER_COLLATE
    _WORKER_DATASET = dataset
    _WORKER_COLLATE = collate_fn


def _process_load_batch(task):
    indices, seed = task
    _reseed_chain(_WORKER_DATASET, seed)
    items = [_WORKER_DATASET[int(i)] for i in indices]
    return _WORKER_COLLATE(items)


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
        worker_type: str = "thread",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self.device_put = device_put
        self.seed = seed
        self.rng = np.random.RandomState(seed)
        self._task_counter = 0
        if worker_type == "process" and num_workers:
            try:
                ctx = multiprocessing.get_context("fork")
            except ValueError:  # no fork on this platform
                worker_type = "thread"
        self.worker_type = worker_type
        self.pool = None
        self.proc_pool = None
        if num_workers and worker_type == "process":
            self.proc_pool = ctx.Pool(
                processes=max(1, num_workers),
                initializer=_process_worker_init,
                initargs=(dataset, collate_fn),
            )
        elif num_workers:
            self.pool = ThreadPoolExecutor(max_workers=max(1, num_workers))

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

    def _iter_process(self) -> Iterator[Any]:
        """Ordered multiprocess batches via Pool.imap (workers prefetch
        ahead; exceptions re-raise here on the consumer)."""

        def tasks():
            for indices in self._batches():
                self._task_counter += 1
                yield ([int(i) for i in indices],
                       self.seed * 1_000_003 + self._task_counter)

        for batch in self.proc_pool.imap(_process_load_batch, tasks()):
            if self.device_put is not None:
                batch = self.device_put(batch)
            yield batch

    def __iter__(self) -> Iterator[Any]:
        if self.proc_pool is not None:
            yield from self._iter_process()
            return
        batch_iter = self._batches()
        sentinel = object()
        # Two producer stages so host-side item loading/augmentation
        # (GIL + cv2) overlaps the host->device transfer (releases the
        # GIL; non-trivial through the tunneled device): a single
        # producer serialized the two and ran slower than the consumer
        # on the 1-core host (AE evidence runs: ~20% data wait).
        q_host: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        q_dev: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        # datasets exposing get_batch (whole-batch vectorized read +
        # augmentation) can bypass per-item dispatch + collate. OPT-IN
        # (EXTDM_BATCH_ITEMS=1): on the 1-core host the big-batch numpy
        # passes fall out of L2 and initial measurements were not a
        # clear win over the per-item path (whose ColorJitter already
        # stacks each clip).
        get_batch = (getattr(self.dataset, "get_batch", None)
                     if os.environ.get("EXTDM_BATCH_ITEMS", "0") == "1"
                     else None)

        def load_stage():
            try:
                for indices in batch_iter:
                    if get_batch is not None:
                        q_host.put(get_batch(indices))
                    else:
                        if self.pool is not None:
                            items = list(self.pool.map(
                                self.dataset.__getitem__,
                                [int(i) for i in indices]))
                        else:
                            items = [self.dataset[int(i)] for i in indices]
                        q_host.put(self.collate_fn(items))
                q_host.put(sentinel)
            except BaseException as e:  # re-raised on the consumer side
                q_host.put(e)

        def transfer_stage():
            while True:
                item = q_host.get()
                if item is sentinel or isinstance(item, BaseException):
                    q_dev.put(item)
                    return
                try:
                    if self.device_put is not None:
                        item = self.device_put(item)
                    q_dev.put(item)
                except BaseException as e:
                    q_dev.put(e)
                    return

        threading.Thread(target=load_stage, daemon=True).start()
        threading.Thread(target=transfer_stage, daemon=True).start()
        while True:
            item = q_dev.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
