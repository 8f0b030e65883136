"""Host-side batching + device prefetch.

Replaces the reference's torch DataLoader stack (num_workers=8,
pin_memory/persistent_workers — config/cod.yml:14-26) with a TPU-idiomatic
pipeline: numpy batch assembly on host, a background prefetch thread that
keeps ``prefetch`` batches in flight, and ``jax.device_put`` with an explicit
``NamedSharding`` so each host transfer lands directly in the right shard
layout (no post-hoc reshards).
"""

from __future__ import annotations

import functools
import queue
import threading
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np


@functools.lru_cache(maxsize=64)
def _indices_map(sharding, shape):
    """Memoized device→index-tuple map (recomputing per batch is pure
    overhead on large meshes; NamedSharding and shape tuples are hashable)."""
    return sharding.devices_indices_map(shape)


def _batch_axis_size(sharding) -> int:
    """Product of mesh axes sharding dim 0 (1 when unsharded/unknown)."""
    spec = getattr(sharding, "spec", None)
    mesh = getattr(sharding, "mesh", None)
    if not spec or mesh is None or spec[0] is None:
        return 1
    names = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
    n = 1
    for name in names:
        n *= mesh.shape[name]
    return n


def local_row_slices(sharding, batch_size: int, addressable=None):
    """Per-addressable-device global-row ranges of a dim-0-sharded batch.

    Returns ``(rows, dev_slices)``: ``rows`` is the sorted list of global row
    indices THIS process must materialize, and ``dev_slices`` maps each
    addressable device to its ``slice`` of the global batch dim. On a
    multi-host pod each process only ever decodes its own rows — the
    torch-DistributedSampler shard, derived here from the sharding itself
    instead of a rank arithmetic convention. ``addressable`` is the
    device predicate (default: the device belongs to this process); tests
    inject a fake predicate to simulate multi-host splits in one process.
    """
    mesh = sharding.mesh
    spec0 = sharding.spec[0] if sharding.spec else None
    row_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(spec0)
    )
    if addressable is None:
        pid = jax.process_index()
        addressable = lambda d: d.process_index == pid
    imap = _indices_map(row_sharding, (batch_size,))
    dev_slices = {}
    rows = set()
    for d, idx in imap.items():
        if not addressable(d):
            continue
        (sl,) = idx
        start = 0 if sl.start is None else sl.start
        stop = batch_size if sl.stop is None else sl.stop
        dev_slices[d] = slice(start, stop)
        rows.update(range(start, stop))
    return sorted(rows), dev_slices


def _dim0_only(sharding) -> bool:
    """True if the spec shards nothing but dim 0 (trailing entries None)."""
    spec = getattr(sharding, "spec", None)
    if spec is None:
        return False
    return all(e is None for e in list(spec)[1:])


def _assemble_global(
    v: np.ndarray, gshape, sharding, row_of: Dict[int, int]
) -> jax.Array:
    """Build a global jax.Array from the host rows THIS process holds.

    ``v`` carries a subset of the global batch's rows; ``row_of`` maps a
    global row index to its position in ``v``. Each addressable device gets
    exactly its shard (rows × any trailing-dim slice) via device_put, and
    the shards are stitched into one global array — the multi-host
    equivalent of ``jax.device_put(global_v, sharding)`` without any
    process ever materializing rows it doesn't own.
    """
    imap = _indices_map(sharding, tuple(gshape))
    pid = jax.process_index()
    arrays = []
    for d, idx in imap.items():
        if d.process_index != pid:
            continue
        sl = idx[0] if idx else slice(None)
        start = 0 if sl.start is None else sl.start
        stop = gshape[0] if sl.stop is None else sl.stop
        local = v[[row_of[g] for g in range(start, stop)]]
        arrays.append(jax.device_put(local[(slice(None),) + tuple(idx[1:])], d))
    return jax.make_array_from_single_device_arrays(tuple(gshape), sharding, arrays)


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
    """Stack sample dicts into NHWC numpy batches; pass strings through.

    ``raw`` stays a per-sample LIST (str or array): it is host-side only,
    consumed per row (visualization naming / PNG dumps — train/loop.py), and
    the multi-host path re-indexes it by global row anyway. Stacking it was
    a pure memcpy on the batch-assembly hot path (~56 MB/batch at 384² bs32)
    with no consumer of the stacked form."""
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if key == "raw" or isinstance(vals[0], str):
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

        # Multi-host: decode only the rows whose shards live on THIS
        # process's devices (the torch-DistributedSampler shard, derived
        # from the sharding instead of rank arithmetic — every host decoding
        # the full global batch would multiply host work by process_count).
        # Restricted to dim-0-only specs: their divisibility is decided by
        # the batch size alone, before any sample shape is known.
        global_batch = len(indices)
        row_of: Optional[Dict[int, int]] = None
        if (
            self.device_put
            and self.sharding is not None
            and jax.process_count() > 1
            and _dim0_only(self.sharding)
            and global_batch % _batch_axis_size(self.sharding) == 0
        ):
            rows, _ = local_row_slices(self.sharding, global_batch)
            if len(rows) < global_batch:
                row_of = {g: i for i, g in enumerate(rows)}
                indices = [indices[r] for r in rows]

        if self._pool is not None:
            samples = list(self._pool.map(fetch, indices))
        else:
            samples = [fetch(i) for i in indices]
        batch = collate(samples)
        if row_of is not None and "raw" in batch:
            # keep 'raw' indexable by GLOBAL row (array fields are global):
            # non-local rows hold None so consumers can't silently mispair
            raw_local = batch["raw"]
            batch["raw"] = [
                raw_local[row_of[g]] if g in row_of else None
                for g in range(global_batch)
            ]
        if self.device_put:
            # 'raw' is host-side only (visualization naming / PNG dumps,
            # reference cod.py:156-217) — never shipped to the device. In
            # the multi-host local-fetch path it holds this process's rows.
            batch = {
                k: self._put(v, global_batch, row_of)
                if isinstance(v, np.ndarray) and k != "raw"
                else v
                for k, v in batch.items()
            }
        return batch

    def _put(
        self,
        v: np.ndarray,
        global_batch: Optional[int] = None,
        row_of: Optional[Dict[int, int]] = None,
    ):
        s = self.sharding
        if s is None:
            return jax.device_put(v)
        if row_of is not None:
            # multi-host local-fetch: v holds only this process's rows;
            # divisibility was decided before fetch (dim-0-only spec)
            gshape = (int(global_batch),) + v.shape[1:]
            return _assemble_global(v, gshape, s, row_of)
        # Tail batches (drop_last=False eval epochs) can be smaller than the
        # configured batch and stop dividing the mesh's data axis; fall back
        # to a replicated placement on the SAME mesh so jitted steps traced
        # with mesh-wide sharding constraints still see compatible devices.
        # drop_last loaders (training) have no tails — an indivisible batch
        # there is a misconfiguration that must fail loudly, not silently
        # disable data parallelism by replicating every batch.
        if not _divisible(s, v.shape):
            if self.drop_last:
                raise ValueError(
                    f"batch shape {v.shape} does not divide the mesh sharding "
                    f"{s.spec} over {getattr(s, 'mesh', None) and dict(s.mesh.shape)} — "
                    "fix batch_size (or input size on a 2-D mesh); replicated "
                    "fallback is reserved for drop_last=False tail batches"
                )
            from jax.sharding import NamedSharding, PartitionSpec

            mesh = getattr(s, "mesh", None)
            if mesh is not None:
                s = NamedSharding(mesh, PartitionSpec())
        if jax.process_count() > 1 and getattr(s, "mesh", None) is not None:
            # multi-process device_put to a global sharding is
            # version-fragile; assemble explicitly from local shards
            ident = {g: g for g in range(v.shape[0])}
            return _assemble_global(v, v.shape, s, ident)
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
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that gives up when the consumer abandoned the
            # epoch (exception in the train step, preemption early-return,
            # plain break): a producer blocked forever in q.put would leak
            # its thread AND prefetch+1 device_put batches per abandoned
            # epoch for the life of the process
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for c in chunks:
                    if stop.is_set() or not _put(self._make_batch(c)):
                        return
                _put(sentinel)
            except BaseException as e:  # noqa: BLE001
                # surface the failure in the consumer — swallowing it would
                # silently truncate the epoch (short training, wrong metrics)
                _put(e)

        t = threading.Thread(target=producer, daemon=True, name="dgtd-prefetch")
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # runs on normal exhaustion AND on GeneratorExit (abandoned
            # iterator): release the producer and drop queued batch refs
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)
