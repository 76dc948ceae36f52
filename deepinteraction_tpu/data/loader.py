"""Multiprocess prefetching batch loader.

Replaces the reference's torch DataLoader workers (mmcv build_dataloader,
workers_per_gpu=4). Worker processes run the numpy pipeline
(pipeline.build_sample: point decode, sweep compose, cv2 image ops) and the
parent thread overlaps host batch assembly with device steps — the same
producer/consumer split, no torch dependency.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from .pipeline import collate

_WORKER_DS = None


def _init_worker(ds):
    global _WORKER_DS
    _WORKER_DS = ds


def _load_one(args):
    # Fork workers snapshot the dataset at pool creation, so the parent's
    # ``dataset.epoch = e`` never reaches them — ship the epoch with every
    # index so per-epoch augmentation seeds and GT-paste fading stay live.
    epoch, i = args
    if hasattr(_WORKER_DS, "epoch"):
        _WORKER_DS.epoch = epoch
    return _WORKER_DS[i]


class DataLoader:
    """Iterates batches of ``batch_size`` samples, ``num_workers`` procs.

    ``drop_last`` is always on in train (static batch shapes); eval pads the
    final batch by repeating the last sample and returns ``pad_count``.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size  # per-PROCESS batch (local devices only)
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.seed = seed
        # multi-host: every process sees the same globally-shuffled index
        # list (epoch_indices is seeded by epoch, not process) and takes a
        # disjoint stride slice of it — the DDP per-rank sampler semantics
        # (reference tools/dist_train.sh; parallel/input.py has the rules)
        self.process_index = process_index
        self.process_count = process_count
        self._pool = None

    def _ensure_pool(self):
        if self.num_workers > 0 and self._pool is None:
            ctx = mp.get_context("fork")
            self._pool = ctx.Pool(
                self.num_workers, initializer=_init_worker, initargs=(self.dataset,)
            )

    def epoch(self, epoch: int = 0, shuffle: Optional[bool] = None) -> Iterator[Dict]:
        train = getattr(self.dataset, "train", False)
        if hasattr(self.dataset, "epoch"):
            self.dataset.epoch = epoch  # drives GT-paste fading
        shuffle = train if shuffle is None else shuffle
        idx = self.dataset.epoch_indices(epoch, shuffle)
        bs = self.batch_size
        if self.process_count > 1:
            if train:
                # lockstep trim so every process runs the same step count
                # (divergent counts deadlock the gradient psum)
                from ..parallel.input import process_shard_indices

                idx = process_shard_indices(
                    idx, bs, self.process_index, self.process_count
                )
            else:
                # eval is embarrassingly parallel; each process pads its own
                # final batch and the gather dedups nothing (disjoint shards)
                idx = list(idx[self.process_index :: self.process_count])
        if train:
            n_batches = len(idx) // bs
            batches = [idx[i * bs : (i + 1) * bs] for i in range(n_batches)]
        else:
            batches = []
            for i in range(0, len(idx), bs):
                chunk = list(idx[i : i + bs])
                pad = bs - len(chunk)
                batches.append((chunk + [chunk[-1]] * pad, pad))

        if self.num_workers == 0:
            for b in batches:
                ids, pad = (b, 0) if train else b
                samples = [self.dataset[int(i)] for i in ids]
                batch = collate(samples)
                if not train:
                    batch["pad_count"] = pad
                yield batch
            return

        self._ensure_pool()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def submit_all():
            for b in batches:
                ids, pad = (b, 0) if train else b
                async_res = [
                    self._pool.apply_async(_load_one, ((epoch, int(i)),)) for i in ids
                ]
                q.put((async_res, pad))
            q.put(None)

        t = threading.Thread(target=submit_all, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            async_res, pad = item
            batch = collate([r.get() for r in async_res])
            if not train:
                batch["pad_count"] = pad
            yield batch
        t.join()

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None
