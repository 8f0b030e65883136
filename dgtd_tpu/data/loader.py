"""Host-side batching + device prefetch.

Replaces the reference's torch DataLoader stack (num_workers=8,
pin_memory/persistent_workers — config/cod.yml:14-26) with a TPU-idiomatic
pipeline: numpy batch assembly on host, a background prefetch thread that
keeps ``prefetch`` batches in flight, and ``jax.device_put`` with an explicit
``NamedSharding`` so each host transfer lands directly in the right shard
layout (no post-hoc reshards).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np


def _divisible(sharding, shape) -> bool:
    """True if ``shape`` tiles evenly under a NamedSharding's spec (the
    device_put requirement); non-NamedSharding objects are assumed fine."""
    spec = getattr(sharding, "spec", None)
    mesh = getattr(sharding, "mesh", None)
    if spec is None or mesh is None:
        return True
    for dim, names in enumerate(spec):
        if names is None or dim >= len(shape):
            continue
        names = names if isinstance(names, tuple) else (names,)
        n = 1
        for name in names:
            n *= mesh.shape[name]
        if shape[dim] % n:
            return False
    return True


def collate(samples) -> Dict[str, Any]:
    """Stack sample dicts into NHWC numpy batches; pass strings through."""
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], str):
            out[key] = vals
        else:
            out[key] = np.stack(vals, axis=0)
    return out


class DataLoader:
    """Minimal epoch-based loader with shuffling and paired-augmentation RNG.

    ``sharding``: optional ``jax.sharding.Sharding`` applied on device_put of
    array fields (batch-dim sharding for data parallelism).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        sharding: Optional[jax.sharding.Sharding] = None,
        prefetch: int = 2,
        device_put: bool = True,
        num_workers: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.sharding = sharding
        self.prefetch = prefetch
        self.device_put = device_put
        self.epoch = 0
        # decode/augment thread pool (recipe num_workers parity; PIL decode
        # and the native pixel pipeline both release the GIL on the hot parts)
        self._pool = None
        if num_workers and num_workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=int(num_workers))

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(idx)
        return idx

    def _make_batch(self, indices) -> Dict[str, Any]:
        train = getattr(self.dataset, "train_mode", False)

        def fetch(i):
            rng = (
                np.random.default_rng((self.seed, self.epoch, int(i))) if train else None
            )
            return self.dataset.get(int(i), rng)

        if self._pool is not None:
            samples = list(self._pool.map(fetch, indices))
        else:
            samples = [fetch(i) for i in indices]
        batch = collate(samples)
        if self.device_put:
            # 'raw' is host-side only (visualization naming / PNG dumps,
            # reference cod.py:156-217) — never shipped to the device.
            batch = {
                k: self._put(v) if isinstance(v, np.ndarray) and k != "raw" else v
                for k, v in batch.items()
            }
        return batch

    def _put(self, v: np.ndarray):
        s = self.sharding
        if s is None:
            return jax.device_put(v)
        # Tail batches (drop_last=False eval epochs) can be smaller than the
        # configured batch and stop dividing the mesh's data axis; fall back
        # to a replicated placement on the SAME mesh so jitted steps traced
        # with mesh-wide sharding constraints still see compatible devices.
        if not _divisible(s, v.shape):
            from jax.sharding import NamedSharding, PartitionSpec

            mesh = getattr(s, "mesh", None)
            if mesh is not None:
                return jax.device_put(v, NamedSharding(mesh, PartitionSpec()))
        return jax.device_put(v, s)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        idx = self._epoch_indices()
        n_batches = len(self)
        chunks = [
            idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(n_batches)
        ]
        self.epoch += 1

        if self.prefetch <= 0:
            for c in chunks:
                yield self._make_batch(c)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for c in chunks:
                    q.put(self._make_batch(c))
                q.put(sentinel)
            except BaseException as e:  # noqa: BLE001
                # surface the failure in the consumer — swallowing it would
                # silently truncate the epoch (short training, wrong metrics)
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
