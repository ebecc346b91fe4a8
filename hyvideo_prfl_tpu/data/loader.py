"""Samplers + batching + device prefetch: the host-side data pump.

Parity target: `diffusers_lite/utils/data_utils.py:300-381`
(BlockDistributedSampler), :483-542 (VideoImageBatchIterator: infinite
epochs, SP-divisibility skipping), and the torch DataLoader plumbing in
dataloader_init (train_prfl.py:443-477, num_replicas = world // sp_size
wiring :455-464).

TPU-native shape: one host process feeds the whole (data, sp) mesh. Each
data-parallel replica index reads a contiguous block of the dataset with a
`start_index` resume offset (restart-from-checkpoint recovery model,
SURVEY.md 5.3); `DataParallelLoader` zips the per-replica streams into one
global batch that the caller `device_put`s with a P("data", ...) sharding.
Mixed-shape latent caches are shape-bucketed host-side (each emitted batch
is shape-uniform -> one XLA compilation per bucket; the static-shape
equivalent of the reference's pad-to-seq_len, model.py:578-587).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Sequence

import numpy as np


class BlockDistributedSampler:
    """Contiguous per-replica index block with resume offset
    (data_utils.py:300-381). num_replicas == number of data-parallel groups
    (world_size // sp_size in the reference, train_prfl.py:455-464).
    Shuffles within the block, reseeded per epoch (set_epoch, the
    reference's sampler.set_epoch semantics)."""

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
        self.epoch = 0
        # ceil like torch's DistributedSampler: when the dataset doesn't
        # divide (or is smaller than the replica count), ranks wrap around
        # instead of getting an empty block (which would starve the
        # infinite-epoch iterator into a spin)
        self.block = max(1, -(-dataset_len // num_replicas))
        # resume offsets are per-replica (the reference passes resume_step
        # raw, train_prfl.py:463); wrap into the block so resuming past a
        # small dataset starts a fresh epoch instead of starving the
        # iterator
        self.start_index %= self.block

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self):
        return max(self.block - self.start_index, 0)

    def __iter__(self) -> Iterator[int]:
        lo = self.rank * self.block
        idxs = [(lo + i) % self.dataset_len for i in range(self.block)]
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
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


def _shape_key(sample: Dict) -> tuple:
    return tuple(
        (k, np.asarray(v).shape)
        for k, v in sorted(sample.items())
        if not isinstance(v, str)
    )


def latent_tokens(shape, patch=(1, 2, 2)) -> int:
    """DiT token count of a [F, H, W, C] latent (seq_len calc,
    train_prfl.py:563-569)."""
    f, h, w = shape[0], shape[1], shape[2]
    return (f // patch[0]) * (h // patch[1]) * (w // patch[2])


class BatchIterator:
    """Infinite epoch-wrapping batch iterator (VideoImageBatchIterator,
    data_utils.py:483-542) with optional background prefetch.

    * sp_size > 1 skips samples whose token count is not divisible by the
      sequence-parallel degree (data_utils.py:515-524).
    * group_by_shape buckets mixed-shape caches so every emitted batch is
      shape-uniform (one compile per bucket instead of a stack crash).
    """

    def __init__(self, dataset, sampler: BlockDistributedSampler,
                 batch_size: int = 1, prefetch: int = 2,
                 to_device=None, sp_size: int = 1,
                 group_by_shape: bool = False,
                 latents_key: str = "latents"):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.to_device = to_device
        self.prefetch = prefetch
        self.sp_size = sp_size
        self.group_by_shape = group_by_shape
        self.latents_key = latents_key
        self._q: Optional[queue.Queue] = None
        self._thread: Optional[threading.Thread] = None

    def _sample_ok(self, sample: Dict) -> bool:
        if self.sp_size <= 1 or self.latents_key not in sample:
            return True
        lat = np.asarray(sample[self.latents_key])
        return latent_tokens(lat.shape) % self.sp_size == 0

    def _gen(self):
        epoch = 0
        buckets: Dict[tuple, list] = {}
        # partial batches carry ACROSS epochs (like the bucket dict): a
        # replica whose block is smaller than batch_size fills its batch
        # over several epochs instead of discarding the remainder and
        # spinning forever (the infinite-iterator contract of the
        # reference's VideoImageBatchIterator, data_utils.py:483-542)
        buf = []
        while True:
            self.sampler.set_epoch(epoch)
            consumed = False
            for idx in self.sampler:
                sample = self.dataset[idx]
                if not self._sample_ok(sample):
                    continue
                consumed = True
                if self.group_by_shape:
                    key = _shape_key(sample)
                    buckets.setdefault(key, []).append(sample)
                    if len(buckets[key]) == self.batch_size:
                        yield stack_batch(buckets.pop(key))
                else:
                    buf.append(sample)
                    if len(buf) == self.batch_size:
                        yield stack_batch(buf)
                        buf = []
            self.sampler.start_index = 0  # subsequent epochs start at 0
            epoch += 1
            if not consumed:
                raise RuntimeError(
                    "data stream made no progress in a full epoch "
                    f"(replica {self.sampler.rank}/{self.sampler.num_replicas},"
                    f" block {self.sampler.block}): every sample was skipped"
                    " (sp divisibility) or the block is empty"
                )

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


class DataParallelLoader:
    """Zip num_replicas per-replica BatchIterator streams into one global
    batch (concat on the batch axis, replica-major) for a single-controller
    mesh. Each replica keeps the reference's contiguous-block stream
    semantics; the caller shards the result with P("data", ...).

    Replaces the reference's per-rank DataLoader + implicit FSDP grad
    averaging (train_prfl.py:443-477); the mesh "data" axis mean happens in
    the jitted loss instead."""

    def __init__(self, dataset, num_replicas: int = 1, batch_size: int = 1,
                 start_index: int = 0, shuffle: bool = False, seed: int = 0,
                 sp_size: int = 1, group_by_shape: bool = False,
                 prefetch: int = 2, to_device=None,
                 replica_ranks: Optional[Sequence[int]] = None):
        # shape bucketing is per-stream; replicas at different buckets
        # cannot concat (mixed-shape caches under DP need per-list buckets)
        assert not (group_by_shape and num_replicas > 1), (
            "group_by_shape requires num_replicas == 1")
        self.iters = []
        self.to_device = to_device
        # multi-host pods: each process streams only ITS replica rows
        # (scripts/_common.local_replica_rows); the global batch is
        # assembled from per-process locals by the to_device callback
        for r in (replica_ranks if replica_ranks is not None
                  else range(num_replicas)):
            sampler = BlockDistributedSampler(
                len(dataset), num_replicas, r, start_index=start_index,
                shuffle=shuffle, seed=seed,
            )
            # prefetch at the zip level, not per replica
            self.iters.append(iter(BatchIterator(
                dataset, sampler, batch_size=batch_size, prefetch=0,
                sp_size=sp_size, group_by_shape=group_by_shape,
            )))
        self.prefetch = prefetch
        self._q: Optional[queue.Queue] = None
        self._thread: Optional[threading.Thread] = None

    def _next_global(self):
        parts = [next(it) for it in self.iters]
        out = {}
        for k in parts[0]:
            vals = [p[k] for p in parts]
            if isinstance(vals[0], list):
                out[k] = [x for v in vals for x in v]
            else:
                out[k] = np.concatenate(vals, axis=0)
        return out

    def _worker(self):
        try:
            while True:
                batch = self._next_global()
                if self.to_device is not None:
                    batch = self.to_device(batch)
                self._q.put(batch)
        except BaseException as e:  # noqa: BLE001
            self._q.put(e)

    def __iter__(self):
        if self.prefetch > 0:
            if self._thread is None:
                self._q = queue.Queue(maxsize=self.prefetch)
                self._thread = threading.Thread(target=self._worker,
                                                daemon=True)
                self._thread.start()
            while True:
                item = self._q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        else:
            while True:
                batch = self._next_global()
                if self.to_device is not None:
                    batch = self.to_device(batch)
                yield batch
