"""Host data pipeline: batching iterator with background prefetch.

Replaces the reference's torch DataLoader workers (base_data_module.py:33-98)
with a thread-prefetched numpy batcher: TPU hosts feed the device via
jax.device_put, so the pipeline's job is to keep one batch ahead of the
jitted step, not to saturate many CPU cores.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

__all__ = ["DataLoader", "GrainDataLoader", "make_loader"]

# process_shard=(process_index, process_count): each host iterates a disjoint
# 1/count slice of the (epoch-shuffled) index order and loads only its LOCAL
# batch rows — the DDP DistributedSampler semantics of the reference
# (base_data_module.py builds per-rank torch DataLoaders under Accelerate).
# parallel/mesh.py:shard_batch reassembles the global device batch from the
# per-host slices via jax.make_array_from_process_local_data.


def _collate(items) -> Dict[str, np.ndarray]:
    out = {}
    for key in items[0]:
        out[key] = np.stack([it[key] for it in items])
    return out


class DataLoader:
    """Minimal epoch-based loader: shuffle, batch, prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        process_shard: Optional[Tuple[int, int]] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.process_shard = process_shard
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.process_shard is not None:
            count = self.process_shard[1]
            # shards stay equal-length so hosts issue the same number of
            # batches (collectives stay in lockstep): truncate when
            # drop_last, pad-with-wrap otherwise (DistributedSampler
            # semantics — every sample is seen, a few duplicated)
            n = n // count if self.drop_last else -(-n // count)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        if self.process_shard is not None:
            # same seed on every host -> identical global order; strided
            # slice -> disjoint equal shards
            index, count = self.process_shard
            if self.drop_last:
                n = len(order) // count * count
                order = order[:n]
            elif len(order) % count:
                pad = count - len(order) % count
                order = np.concatenate([order, order[:pad]])
            order = order[index::count]
        return order

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._index_order()
        self.epoch += 1
        n_batches = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    idx = order[b * self.batch_size : (b + 1) * self.batch_size]
                    q.put(_collate([self.dataset[int(i)] for i in idx]))
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


class GrainDataLoader:
    """Multi-process loader on Google grain (TPU-idiomatic host input
    pipeline): per-worker processes decode/augment clips in parallel and the
    loader keeps batches prefetched ahead of the jitted step. Same iteration
    protocol as :class:`DataLoader` (dicts of stacked numpy arrays).

    Counterpart of the reference's torch DataLoader `num_workers`
    (base_data_module.py:33-98).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        process_shard: Optional[Tuple[int, int]] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self.process_shard = process_shard
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.process_shard is not None:
            n = n // self.process_shard[1]
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        import grain.python as grain

        if self.process_shard is not None:
            shard_options = grain.ShardOptions(
                shard_index=self.process_shard[0],
                shard_count=self.process_shard[1],
                drop_remainder=True,
            )
        else:
            shard_options = grain.NoSharding()
        sampler = grain.IndexSampler(
            num_records=len(self.dataset),
            shard_options=shard_options,
            shuffle=self.shuffle,
            num_epochs=1,
            seed=self.seed + self.epoch,
        )
        self.epoch += 1
        # batching happens HERE, not as a grain operation: grain applies
        # operations per worker shard, so Batch(batch_size) inside the pool
        # silently drops everything whenever records/worker < batch_size
        workers = max(1, min(self.num_workers, len(self.dataset) // self.batch_size))
        loader = grain.DataLoader(
            data_source=self.dataset,
            sampler=sampler,
            operations=[],
            worker_count=workers,
        )
        buf = []
        for item in loader:
            buf.append(item)
            if len(buf) == self.batch_size:
                yield _collate(buf)
                buf = []
        if buf and not self.drop_last:
            yield _collate(buf)


def make_loader(
    dataset,
    batch_size: int,
    shuffle: bool = False,
    drop_last: bool = True,
    seed: int = 0,
    num_workers: int = 0,
    process_shard: Optional[Tuple[int, int]] = None,
):
    """Loader factory: grain worker processes when ``num_workers > 0``,
    the in-process thread-prefetch loader otherwise. ``batch_size`` is the
    PER-PROCESS batch when ``process_shard`` is set."""
    if num_workers and num_workers > 0:
        return GrainDataLoader(
            dataset, batch_size, shuffle=shuffle, drop_last=drop_last,
            seed=seed, num_workers=num_workers, process_shard=process_shard,
        )
    return DataLoader(
        dataset, batch_size, shuffle=shuffle, drop_last=drop_last, seed=seed,
        process_shard=process_shard,
    )
