"""Batched, prefetching data loading.

The TPU-native replacement for the reference's Lightning DataModule + torch
DataLoader stack (data/modules.py:11-92): worker threads materialize and
collate chips on the host while a double-buffered prefetcher keeps the next
batch in flight to the device — compute never waits on host IO.
"""

import queue
import threading
import typing as T

import jax
import numpy as np

from .batch import Batch, collate
from .datasets import ChipDataset


def process_local_selection(
    num_files: int, process_index: int, process_count: int
) -> np.ndarray:
    """Strided file assignment for multi-host loading: process p takes
    files p, p+P, p+2P, ... so every chip belongs to exactly one process
    and per-process counts differ by at most one."""
    return np.arange(process_index, num_files, process_count)


class ChipLoader:
    """Iterate a ChipDataset in collated batches with background prefetch."""

    def __init__(
        self,
        dataset: ChipDataset,
        batch_size: int = 4,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 2,
        prefetch: int = 2,
        rng: T.Optional[np.random.Generator] = None,
        sharding: T.Optional[jax.sharding.Sharding] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.rng = rng or np.random.default_rng(dataset.random_seed)
        self.sharding = sharding

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> T.List[np.ndarray]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            order = self.rng.permutation(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches = batches[:-1]
        return batches

    def _materialize(self, indices: np.ndarray) -> Batch:
        from ..utils.host import host_context

        with host_context():
            samples = [self.dataset[int(i)] for i in indices]
            batch = collate(samples)
        if self.sharding is not None:
            if jax.process_count() > 1:
                # Multi-host: this process loaded only its local shard of
                # the global batch; contribute it to a global jax.Array
                # (per-rank DDP DataLoader analogue, reference
                # model.py:179-185).
                from ..parallel.mesh import global_batch_from_local

                batch = global_batch_from_local(batch, self.sharding)
            else:
                batch = jax.tree_util.tree_map(
                    lambda leaf: jax.device_put(leaf, self.sharding), batch
                )
        return batch

    def __iter__(self) -> T.Iterator[Batch]:
        batches = self._batch_indices()
        if not batches:
            return

        out_queue: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for indices in batches:
                    if stop.is_set():
                        return
                    out_queue.put(self._materialize(indices))
            except Exception as exc:  # propagate to consumer
                out_queue.put(exc)
            finally:
                out_queue.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_queue.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            thread.join(timeout=1.0)
