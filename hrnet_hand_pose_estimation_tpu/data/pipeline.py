"""Input pipeline: batching, shuffling, threaded prefetch, device transfer.

TPU-native replacement for the reference's torch ``DataLoader`` stack
(lib/dataset/build.py:66-129 + WORKERS subprocesses + DistributedSampler):
- map-style datasets (``__len__``/``__getitem__`` -> dict of numpy arrays)
- epoch-seeded shuffling (the reference calls ``sampler.set_epoch``,
  tools/train.py:339-341; here the epoch seeds a counter-based Generator)
- a small thread pool overlaps the cv2/numpy sample work with device compute
  (python threads suffice: cv2 and numpy release the GIL in their hot parts)
- ``device_prefetch`` keeps N batches in flight on the TPU so host work and
  device steps overlap — the analog of pin_memory+non_blocking H2D.

Sharding: with a mesh, ``shard_batch`` places each global batch with
batch-axis sharding; per-host sharding for multi-host runs selects the
host's slice by ``jax.process_index()`` — replacing DistributedSampler.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Sequence

import numpy as np


def default_collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]):
            out[key] = np.stack([np.asarray(v) for v in vals])
        else:
            out[key] = vals  # e.g. paths
    return out


class DataLoader:
    """Minimal map-style loader with shuffle + worker threads."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        collate_fn: Callable = default_collate,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(0, int(num_workers))
        self.collate = collate_fn
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def __len__(self) -> int:
        n = self._host_count()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _host_count(self) -> int:
        """Samples this host iterates (its DistributedSampler-style share)."""
        n = len(self.dataset)
        import jax

        n_proc = jax.process_count()
        return n if n_proc == 1 else n // n_proc

    def _index_order(self) -> np.ndarray:
        """Epoch-seeded global order, then this host's disjoint slice.

        The global shuffle is seeded identically on every host (the seed is
        (self.seed, epoch), independent of process index), so the per-host
        slices partition the epoch exactly like the reference's
        DistributedSampler (lib/dataset/build.py:78-83).
        """
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(idx)
        return host_local_slice(idx)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._index_order()
        n_batches = len(self)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_batches)]

        if self.num_workers == 0:
            for b in batches:
                yield self.collate([self.dataset[int(i)] for i in b])
            return

        # pipeline batches through a thread pool, preserving order
        from concurrent.futures import ThreadPoolExecutor

        def load(b):
            return self.collate([self.dataset[int(i)] for i in b])

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            depth = self.num_workers + 1
            futures = [pool.submit(load, b) for b in batches[:depth]]
            next_submit = depth
            for i in range(n_batches):
                batch = futures[i].result()
                if next_submit < n_batches:
                    futures.append(pool.submit(load, batches[next_submit]))
                    next_submit += 1
                yield batch


def device_prefetch(iterator: Iterator, mesh=None, depth: int = 2) -> Iterator:
    """Move batches to device ahead of consumption.

    With a mesh, arrays go up with batch-axis sharding (parallel/mesh.py
    shard_batch); otherwise a plain device_put.
    """
    import jax

    from ..parallel.mesh import shard_batch

    def put(batch):
        dev_batch = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        rest = {k: v for k, v in batch.items() if not isinstance(v, np.ndarray)}
        if mesh is not None:
            dev_batch = shard_batch(mesh, dev_batch)
        else:
            dev_batch = jax.device_put(dev_batch)
        dev_batch.update(rest)
        return dev_batch

    buf: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    failure: list = []

    def producer():
        try:
            for item in iterator:
                buf.put(put(item))
        except BaseException as e:  # surface in the consumer, don't truncate
            failure.append(e)
        finally:
            buf.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = buf.get()
        if item is sentinel:
            if failure:
                raise failure[0]
            return
        yield item


def host_local_slice(global_indices: np.ndarray) -> np.ndarray:
    """Multi-host data sharding: this host's contiguous slice of the global
    index order (replaces DistributedSampler, reference build.py:78-83)."""
    import jax

    n_proc = jax.process_count()
    if n_proc == 1:
        return global_indices
    per = len(global_indices) // n_proc
    p = jax.process_index()
    return global_indices[p * per:(p + 1) * per]
