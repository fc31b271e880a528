"""Data loading: sharded iteration-oriented sampling + threaded prefetch.

Parity targets:
  * ``DistIterSampler`` (``codes/data/data_sampler.py:12-65``): dataset
    enlarged x ratio for iteration-oriented training, epoch-seeded randperm,
    modulo indexing, rank-strided subsample — here per *host* (JAX process),
    since within a host the global batch is sharded by the mesh, not the
    loader.
  * ``create_dataloader`` (``codes/data/__init__.py:19-42``): train loaders
    shuffle + drop-last; val loaders run batch 1 in order.

The prefetcher overlaps image decode (cv2, CPU threads) with TPU steps —
the double-buffered host->device stage of the north star.
"""

from __future__ import annotations

import math
import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class ShardedIterSampler:
    """Epoch-seeded, enlarged, host-strided index stream."""

    def __init__(self, n_items: int, ratio: int = 100, world_size: int = 1,
                 rank: int = 0, seed: int = 0):
        self.n_items = n_items
        self.ratio = ratio
        self.world_size = world_size
        self.rank = rank
        self.seed = seed
        self.num_samples = int(
            math.ceil(n_items * ratio / world_size)
        )
        self.total_size = self.num_samples * world_size

    def epoch_indices(self, epoch: int) -> np.ndarray:
        g = np.random.default_rng(self.seed + epoch)
        idx = g.permutation(self.total_size) % self.n_items
        return idx[self.rank::self.world_size]


class DataLoader:
    """Minimal threaded loader: dataset + collate + prefetch queue."""

    def __init__(self, dataset, batch_size: int, collate: Callable,
                 sampler: Optional[ShardedIterSampler] = None,
                 num_workers: int = 4, drop_last: bool = True,
                 prefetch: int = 4, shuffle: bool = True, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.sampler = sampler
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.shuffle = shuffle
        self.seed = seed

    def _index_batches(self, epoch: int):
        if self.sampler is not None:
            idx = self.sampler.epoch_indices(epoch)
        else:
            idx = np.arange(len(self.dataset))
            if self.shuffle:
                np.random.default_rng(self.seed + epoch).shuffle(idx)
        nb = len(idx) // self.batch_size
        rem = len(idx) % self.batch_size
        for b in range(nb):
            yield idx[b * self.batch_size:(b + 1) * self.batch_size]
        if rem and not self.drop_last:
            yield idx[nb * self.batch_size:]

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        """Yield collated batches with threaded sample loading + prefetch."""
        batches = list(self._index_batches(epoch))
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_checked(item) -> bool:
            # bounded put that re-checks stop: if the consumer abandons the
            # generator, the queue stays full and a bare q.put() would block
            # this thread forever (leaking it and its batches)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        # batch-level loading (dataset.load_batch): the dataset draws ONE
        # shape bucket per batch (mixed-scale training) — a per-sample
        # __getitem__ cannot make a batch-consistent choice
        batch_level = getattr(self.dataset, "use_load_batch", False)

        def worker():
            try:
                for batch_idx in batches:
                    if stop.is_set():
                        break
                    if batch_level:
                        batch = self.dataset.load_batch(
                            [int(i) for i in batch_idx])
                    else:
                        samples = [self.dataset[int(i)] for i in batch_idx]
                        batch = self.collate(samples)
                    if not put_checked(batch):
                        return
            finally:
                if not put_checked(None):
                    pass  # consumer gone; nothing is waiting on the sentinel

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()

    def __len__(self):
        if self.sampler is not None:
            n = self.sampler.num_samples
        else:
            n = len(self.dataset)
        return n // self.batch_size if self.drop_last else math.ceil(
            n / self.batch_size
        )
