"""Threaded batch loader with double-buffered device prefetch.

Replaces torch DataLoader worker processes (train_dsec.py:79) with a thread pool —
the per-sample work here is numpy / cv2 / h5py / the native voxelizer, all of which
release the GIL — plus an async device-transfer stage so host IO and voxelization
overlap TPU compute (SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Sequence

import jax
import numpy as np

from frn_tpu.config import DatasetGeometry
from frn_tpu.data.collate import collate_fixed


class BatchLoader:
    """Iterates fixed-shape batches from an indexable dataset.

    Args:
      dataset: supports __len__ and __getitem__ -> sample dict.
      geometry: static padding target.
      batch_size: fixed batch size; the trailing partial batch is padded and
        flagged via 'sample_mask'.
      shuffle: reshuffle indices each epoch.
      num_threads: sample-loading worker threads (0 = synchronous).
      drop_last: drop the trailing partial batch.
    """

    def __init__(
        self,
        dataset,
        geometry: DatasetGeometry,
        batch_size: int = 1,
        shuffle: bool = False,
        num_threads: int = 4,
        max_annots: int = 64,
        drop_last: bool = False,
        seed: int = 0,
        transform: Optional[Callable] = None,
    ):
        self.dataset = dataset
        self.geometry = geometry
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_threads = num_threads
        self.max_annots = max_annots
        self.drop_last = drop_last
        self.transform = transform
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def _load(self, i: int) -> Dict[str, np.ndarray]:
        s = self.dataset[int(i)]
        if self.transform is not None:
            s = self.transform(s)
        return s

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._epoch_indices()
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        if self.num_threads <= 0:
            for b in batches:
                samples = [self._load(i) for i in b]
                yield collate_fixed(samples, self.geometry, self.max_annots, self.batch_size)
            return

        # pipeline: worker threads fill a bounded queue of collated batches
        out_q: "queue.Queue" = queue.Queue(maxsize=4)
        stop = threading.Event()

        def put_checking_stop(item) -> bool:
            # never block forever on a full queue: an abandoned consumer sets
            # stop, and a plain out_q.put would leak this thread + its futures
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_threads) as pool:
                    # rolling window of per-sample futures: loads for the next
                    # batches are already submitted while the current batch
                    # collates, so workers never drain at batch boundaries
                    # (a pool.map per batch would serialize load->collate)
                    in_flight: collections.deque = collections.deque()
                    bi = 0
                    try:
                        while bi < len(batches) or in_flight:
                            while bi < len(batches) and len(in_flight) < 3:
                                in_flight.append(
                                    [pool.submit(self._load, i) for i in batches[bi]]
                                )
                                bi += 1
                            if stop.is_set():
                                return
                            samples = [f.result() for f in in_flight.popleft()]
                            if not put_checking_stop(
                                collate_fixed(samples, self.geometry, self.max_annots, self.batch_size)
                            ):
                                return
                    finally:
                        for fs in in_flight:
                            for f in fs:
                                f.cancel()
            except Exception as e:  # surface worker errors to the consumer
                put_checking_stop(e)
            finally:
                put_checking_stop(None)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Overlap host batch production with device compute.

    Eagerly device_puts `size` batches ahead (optionally with a NamedSharding for
    multi-chip data parallelism) so the accelerator never waits on host IO.
    """
    buf = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda a: jax.device_put(a, sharding), batch
            )
        return jax.tree_util.tree_map(jax.device_put, batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
