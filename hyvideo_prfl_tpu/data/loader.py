"""Samplers + batching + device prefetch: the host-side data pump.

Parity target: `diffusers_lite/utils/data_utils.py:300-381`
(BlockDistributedSampler), :483-542 (VideoImageBatchIterator), and the
torch DataLoader plumbing in dataloader_init (train_prfl.py:443-477).

TPU-native shape: one host process feeds the whole (data, sp) mesh. Each
data-parallel replica index reads a contiguous block of the dataset with a
`start_index` resume offset (restart-from-checkpoint recovery model,
SURVEY.md 5.3); batches are stacked host-side and moved to device with a
double-buffered background prefetch thread.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Sequence

import numpy as np


class BlockDistributedSampler:
    """Contiguous per-replica index block with resume offset
    (data_utils.py:300-381). num_replicas == number of data-parallel groups
    (world_size // sp_size in the reference, train_prfl.py:455-464)."""

    def __init__(self, dataset_len: int, num_replicas: int = 1, rank: int = 0,
                 start_index: int = 0, shuffle: bool = False,
                 seed: int = 0):
        assert 0 <= rank < num_replicas
        self.dataset_len = dataset_len
        self.num_replicas = num_replicas
        self.rank = rank
        self.start_index = start_index
        self.shuffle = shuffle
        self.seed = seed
        self.block = dataset_len // num_replicas

    def __len__(self):
        return max(self.block - self.start_index, 0)

    def __iter__(self) -> Iterator[int]:
        lo = self.rank * self.block
        idxs = list(range(lo, lo + self.block))
        if self.shuffle:
            rng = np.random.RandomState(self.seed)
            rng.shuffle(idxs)
        return iter(idxs[self.start_index:])


def stack_batch(samples: Sequence[Dict]) -> Dict[str, np.ndarray]:
    """Stack per-sample dicts; string fields become lists."""
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], str):
            out[k] = vals
        else:
            out[k] = np.stack([np.asarray(v) for v in vals])
    return out


class BatchIterator:
    """Infinite epoch-wrapping batch iterator (VideoImageBatchIterator,
    data_utils.py:483-542) with optional background prefetch."""

    def __init__(self, dataset, sampler: BlockDistributedSampler,
                 batch_size: int = 1, prefetch: int = 2,
                 to_device=None):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.to_device = to_device
        self.prefetch = prefetch
        self._q: Optional[queue.Queue] = None
        self._thread: Optional[threading.Thread] = None

    def _gen(self):
        while True:
            buf = []
            for idx in self.sampler:
                buf.append(self.dataset[idx])
                if len(buf) == self.batch_size:
                    yield stack_batch(buf)
                    buf = []
            self.sampler.start_index = 0  # subsequent epochs start at 0

    def _worker(self):
        # propagate exceptions to the consumer instead of dying silently
        # (a dead daemon worker would deadlock the q.get below)
        try:
            for batch in self._gen():
                if self.to_device is not None:
                    batch = self.to_device(batch)
                self._q.put(batch)
        except BaseException as e:  # noqa: BLE001
            self._q.put(e)

    def __iter__(self):
        if self.prefetch > 0:
            if self._thread is None:
                self._q = queue.Queue(maxsize=self.prefetch)
                self._thread = threading.Thread(target=self._worker, daemon=True)
                self._thread.start()
            while True:
                item = self._q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        else:
            for batch in self._gen():
                if self.to_device is not None:
                    batch = self.to_device(batch)
                yield batch
