"""Threaded prefetching data loader (numpy batches).

Replaces torch DataLoader worker processes (basic_train.py:22-31) with a
thread pool: dataset items are decoded/augmented on CPU threads while the
accelerator runs, and stacked into numpy batches. Device transfer + sharding
happen in the trainer (arflow_tpu.parallel.shard_batch).
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def default_collate(items):
    """Stack a list of sample dicts into a batch dict of arrays."""
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], dict):
            out[key] = default_collate(vals)
        elif isinstance(vals[0], str):
            out[key] = vals
        else:
            out[key] = np.stack([np.asarray(v) for v in vals])
    return out


class DataLoader:
    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=2,
                 drop_last=False, seed=0, collate_fn=default_collate,
                 prefetch=4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size : (b + 1) * self.batch_size]

    def __iter__(self):
        batch_queue: queue.Queue = queue.Queue(maxsize=self.prefetch)
        index_queue: queue.Queue = queue.Queue()
        batches = list(self._batches())
        for i, b in enumerate(batches):
            index_queue.put((i, b))
        results = {}
        lock = threading.Lock()
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    i, batch_idx = index_queue.get_nowait()
                except queue.Empty:
                    return
                try:
                    items = [self.dataset[int(j)] for j in batch_idx]
                    batch = self.collate_fn(items)
                except Exception as e:  # propagate to consumer
                    batch = e
                with lock:
                    results[i] = batch

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        try:
            next_i = 0
            import time

            while next_i < len(batches):
                with lock:
                    ready = next_i in results
                if not ready:
                    time.sleep(0.001)
                    continue
                with lock:
                    batch = results.pop(next_i)
                if isinstance(batch, Exception):
                    raise batch
                yield batch
                next_i += 1
        finally:
            stop.set()


class InMemoryDataset:
    """Tiny dataset over preloaded sample dicts (tests / synthetic data)."""

    def __init__(self, samples):
        self.samples = list(samples)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        return self.samples[idx]
