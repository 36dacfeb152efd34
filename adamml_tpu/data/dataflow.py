"""Host data loader: sharded, shuffled, thread-prefetched batches.

Replaces the reference's torch DataLoader + DistributedSampler stack
(reference utils/utils.py:153-163): per-process index sharding (one shard per
jax process), epoch-seeded shuffling (the DistributedSampler.set_epoch
equivalent, reference utils/utils.py:197-198), a thread pool for decode
parallelism, and a small look-ahead queue so host decode overlaps device
compute. Augmentation parameters for the device preprocessing op are drawn
here, per sample per modality (matching the reference's independent
per-modality transform randomness, reference train_adamml.py:226-234).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from .aug_params import sample_crop_flip


class HostDataLoader:
    def __init__(self, dataset, batch_size: int, *, is_train: bool,
                 input_size: int = 224, augmentor_ver: str = "v2",
                 scale_range: Sequence[int] = (256, 320),
                 disable_scaleup: bool = False, workers: int = 8,
                 seed: int = 0, num_shards: int = 1, shard_index: int = 0,
                 drop_last: Optional[bool] = None, prefetch: int = 2) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.is_train = is_train
        self.input_size = input_size
        self.augmentor_ver = augmentor_ver
        self.scale_range = tuple(scale_range)
        self.disable_scaleup = disable_scaleup
        self.workers = max(1, workers)
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.drop_last = is_train if drop_last is None else drop_last
        self.prefetch = prefetch
        self.epoch = 0
        self.modality = list(getattr(dataset, "modality", ["rgb"]))

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.is_train:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        # contiguous shard per process (DistributedSampler-style round robin)
        return order[self.shard_index::self.num_shards]

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _collate(self, samples, rng: np.random.RandomState) -> Dict:
        batch: Dict[str, np.ndarray] = {}
        labels = []
        per_mod: Dict[str, list] = {m: [] for m in self.modality}
        for payload, label in samples:
            labels.append(label)
            for m in self.modality:
                per_mod[m].append(payload[m])
        for m in self.modality:
            items = per_mod[m]
            if m == "sound":
                batch["sound_wave"] = np.stack([it["wave"] for it in items])
                batch["sound_valid"] = np.stack([it["valid"] for it in items])
                continue
            frames = np.stack([it["frames"] for it in items])
            hw = np.stack([it["hw"] for it in items])
            crop, flip = sample_crop_flip(
                hw, input_size=self.input_size, train=self.is_train,
                version=self.augmentor_ver, scale_range=self.scale_range,
                disable_scaleup=self.disable_scaleup, rng=rng)
            if not self.is_train:
                flip = np.zeros_like(flip)
            batch[f"{m}_frames"] = frames
            batch[f"{m}_crop"] = crop
            batch[f"{m}_flip"] = flip
        first = labels[0]
        if isinstance(first, (int, np.integer)):
            batch["target"] = np.asarray(labels, np.int32)
        else:
            batch["target"] = np.stack(labels).astype(np.float32)
        return batch

    def _sample_rng(self, index: int) -> np.random.RandomState:
        """Per-sample RandomState keyed on (seed, epoch, index): identical
        seeds reproduce identical frame indices regardless of thread
        scheduling, and no worker ever touches the global np.random."""
        mix = (1_000_003 * self.seed + 9_176_957 * (self.epoch + 1)
               + 2_654_435_761 * index) % (2**31 - 1)
        return np.random.RandomState(mix)

    def _fetch(self, index: int):
        idx = int(index)
        get = getattr(self.dataset, "get_sample", None)
        if get is not None:
            return get(idx, self._sample_rng(idx))
        return self.dataset[idx]

    def __iter__(self) -> Iterator[Dict]:
        indices = self._indices()
        nb = len(self)
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]
        rng = np.random.RandomState(
            (self.seed + 7919 * (self.epoch + 1)) % (2**31))

        pool = ThreadPoolExecutor(max_workers=self.workers)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                for idxs in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self._fetch,
                                            [int(i) for i in idxs]))
                    out_q.put(self._collate(samples, rng))
                out_q.put(None)
            except BaseException as e:  # surface worker errors to consumer
                out_q.put(e)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False)
