"""Batched, prefetching data loader (host -> TPU pipeline).

Replaces the torch ``DataLoader(num_workers, DistributedSampler)`` stack
(``model_wrapper.py:768-793``) with a thread-pool loader that collates
channel-last numpy batches and prefetches ahead of the accelerator.  Sharding
across hosts is index-striding by (rank, world_size) — the DistributedSampler
contract (``model_wrapper.py:761-765``).
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

BATCH_KEYS_STACK = (
    'rgb', 'rgb_original', 'depth', 'input_depth', 'edge', 'rgb_edge',
    'rgb_edge_for_loss', 'edge_1', 'edge_2', 'edge_3', 'lidar', 'seg',
    'normal', 'normal_1', 'normal_2', 'normal_3', 'intrinsics')


def collate(samples):
    """Stack samples into NHWC numpy batches (fixed shapes post-resize)."""
    batch = {}
    first = samples[0]
    for key in first:
        vals = [s[key] for s in samples]
        if key in BATCH_KEYS_STACK:
            batch[key] = np.stack(vals)
        elif key in ('rgb_context', 'rgb_context_original', 'depth_context'):
            n_ctx = len(vals[0])
            batch[key] = [np.stack([v[i] for v in vals]) for i in range(n_ctx)]
        elif key == 'idx':
            batch[key] = np.asarray(vals)
        else:
            batch[key] = vals   # filenames etc. stay as lists
    return batch


class DataLoader:
    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=2,
                 drop_last=False, seed=42, rank=0, world_size=1,
                 prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # rank-strided sharding (DistributedSampler contract)
        idx = idx[self.rank::self.world_size]
        return idx

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        idx = self._indices()
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        break
                    samples = list(pool.map(self.dataset.__getitem__, b))
                    q.put(collate(samples))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
