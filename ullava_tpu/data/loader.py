"""Minimal threaded data loader (torch DataLoader replacement).

Host-side pipeline feeding jit steps: seeded epoch shuffling, drop-last
fixed batch size (static shapes), thread-pool sample fetch + background
batch prefetch so image decode overlaps device compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        shuffle: bool = True,
        seed: int = 42,
        num_workers: int = 8,
        drop_last: bool = True,
        prefetch: int = 2,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        """batch_size is the per-process batch. Under multi-host
        (`jax.process_count() > 1`) each process reads its own stripe of
        the seeded global order — same epoch permutation everywhere, so
        the global batch is consistent without a distributed sampler
        service (the torchrun DistributedSampler equivalent)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0
        if process_index is None or process_count is None:
            try:
                import jax

                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self) -> int:
        n = len(self.dataset) // self.process_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # Per-process stripe of the shared permutation.
        return idx[self.process_index :: self.process_count]

    def __iter__(self) -> Iterator:
        return self.iter_from(0)

    def iter_from(self, start_batch: int) -> Iterator:
        """Iterate this epoch starting at batch index `start_batch`.

        Resume fast-forward is index arithmetic: earlier batches are never
        fetched or decoded (replaying 595K samples of host-side image
        decode just to skip them is the failure mode this avoids). The
        epoch permutation is seeded, so batch `i` is identical to what a
        full iteration would have produced."""
        idx = self._indices()
        n_batches = len(self)
        batches = [
            idx[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(int(start_batch), n_batches)
        ]
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, b))
                    out_q.put(self.collate_fn(samples))
            out_q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
