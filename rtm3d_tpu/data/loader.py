"""Batching loader with per-host sharding and background prefetch.

Replaces torch DataLoader + DistributedSampler (dataset_reader.py:306-322,
train_multi_gpu.py:164-165): each JAX process reads a strided shard of a
seeded per-epoch permutation (``set_epoch`` parity), samples are assembled
into fixed-shape numpy batches, and a small background thread keeps a queue
of ready batches so host input overlaps device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import numpy as np


def _stack(samples) -> Dict:
    batch: Dict = {
        "labels": {
            k: np.stack([s["labels"][k] for s in samples], axis=0)
            for k in samples[0]["labels"]
        },
        "path": [s["path"] for s in samples],
    }
    for key in samples[0]:
        if key in ("labels", "path"):
            continue
        batch[key] = np.stack([s[key] for s in samples], axis=0)
    return batch


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 20,
        drop_last: bool = True,
        num_shards: Optional[int] = None,
        shard_index: Optional[int] = None,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_shards = num_shards if num_shards is not None else jax.process_count()
        self.shard_index = (
            shard_index if shard_index is not None else jax.process_index()
        )
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """Per-epoch reshuffle parity with DistributedSampler.set_epoch."""
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx[self.shard_index :: self.num_shards]

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _produce(self, q: "queue.Queue"):
        rng = np.random.RandomState(self.seed * 100003 + self.epoch)
        idx = self._indices()
        nb = len(self)
        for b in range(nb):
            chunk = idx[b * self.batch_size : (b + 1) * self.batch_size]
            samples = [self.dataset.__getitem__(int(i), rng=rng) for i in chunk]
            q.put(_stack(samples))
        q.put(None)

    def __iter__(self) -> Iterator[Dict]:
        q: "queue.Queue" = queue.Queue(maxsize=max(self.prefetch, 1))
        t = threading.Thread(target=self._produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item
