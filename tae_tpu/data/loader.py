"""Batch assembly, multiprocess decode workers, and device prefetch.

The reference leans on torch DataLoader / wds.WebLoader worker processes for
JPEG decode + augmentation and moves batches with per-step blocking H2D
copies (reference train.py:85,134). Here:

  * ``BatchLoader`` runs the sample pipeline either inline or across N
    spawned worker processes (workers never touch JAX — pure PIL/numpy),
    each worker assembling whole batches from its own shard subset, consumed
    round-robin;
  * ``device_prefetch`` keeps ``depth`` batches in flight with async
    ``jax.device_put`` (optionally sharded across the mesh), so the H2D copy
    of batch k+1 overlaps step k — the double-buffered input path called for
    by BASELINE.json's north star.
"""

from __future__ import annotations

import collections
import itertools
import multiprocessing as mp
import queue as queue_mod
from typing import Any, Callable, Iterable, Iterator

import numpy as np

# max samples a rebatch worker buffers/ships per queue item (memory cap)
_REBATCH_CHUNK = 256


def default_collate(samples: list[Any]) -> Any:
    """Stack a list of (nested tuples of) arrays/scalars into batch arrays."""
    first = samples[0]
    if isinstance(first, (tuple, list)):
        return type(first)(default_collate([s[i] for s in samples])
                           for i in range(len(first)))
    if isinstance(first, dict):
        return {k: default_collate([s[k] for s in samples]) for k in first}
    return np.stack([np.asarray(s) for s in samples])


def batched(it: Iterable[Any], batch_size: int, drop_last: bool = False,
            collate: Callable = default_collate) -> Iterator[Any]:
    buf: list[Any] = []
    for x in it:
        buf.append(x)
        if len(buf) == batch_size:
            yield collate(buf)
            buf = []
    if buf and not drop_last:
        yield collate(buf)


def _worker_main(make_iter, worker_id: int, num_workers: int, batch_size: int,
                 drop_last: bool, prebatched: bool, rebatch: bool,
                 q: mp.Queue) -> None:
    try:
        it = make_iter(worker_id, num_workers)
        if rebatch:
            # ship uncollated sample chunks; the consumer assembles exact
            # batches so the dataset tail is ONE partial batch, not one per
            # worker (matters for mean-of-batch-means eval parity). Chunks are
            # capped well below batch_size: each worker buffering a full
            # 8192-image eval batch would hold ~6 GB × num_workers on the host.
            chunk_size = min(batch_size, _REBATCH_CHUNK)
            for chunk in batched(it, chunk_size, collate=list):
                q.put(("chunk", chunk))
        else:
            if not prebatched:
                it = batched(it, batch_size, drop_last)
            for batch in it:
                q.put(("batch", batch))
        q.put(("end", worker_id))
    except KeyboardInterrupt:  # pragma: no cover
        pass
    except Exception as e:  # pragma: no cover - surfaced to the consumer
        q.put(("error", f"{type(e).__name__}: {e}"))


class BatchLoader:
    """Iterate batches from ``make_iter(worker_id, num_workers)``.

    ``make_iter`` must be picklable (top-level function / functools.partial)
    when ``num_workers > 0``; each worker streams a disjoint shard subset
    (shard-level splitting is the reader's job via worker_id/num_workers).

    ``prebatched=True`` means ``make_iter`` already yields whole batches
    (e.g. the native ``decode_batch`` path, which decodes straight into the
    batch buffer — measured 1.7x the per-sample path, which loses ~40% of
    host time to the ``np.stack`` collate copy).

    ``rebatch=True`` assembles exact-size batches on the consumer from
    uncollated worker sample chunks, so a finite dataset ends in exactly ONE
    partial batch instead of one per worker — required for the reference's
    mean-of-batch-means eval metric (train.py:220) to be loader-invariant.
    """

    def __init__(self, make_iter: Callable[[int, int], Iterable[Any]],
                 batch_size: int, num_workers: int = 0, drop_last: bool = False,
                 prefetch_batches: int = 4, prebatched: bool = False,
                 rebatch: bool = False):
        if rebatch and prebatched:
            raise ValueError("rebatch and prebatched are mutually exclusive")
        self.make_iter = make_iter
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.prefetch_batches = prefetch_batches
        self.prebatched = prebatched
        self.rebatch = rebatch

    def __iter__(self) -> Iterator[Any]:
        if self.num_workers == 0:
            if self.prebatched:
                yield from self.make_iter(0, 1)
            else:
                yield from batched(self.make_iter(0, 1), self.batch_size,
                                   self.drop_last)
            return
        ctx = mp.get_context("spawn")
        q: mp.Queue = ctx.Queue(maxsize=max(2, self.prefetch_batches))
        procs = [
            ctx.Process(target=_worker_main,
                        args=(self.make_iter, i, self.num_workers,
                              self.batch_size, self.drop_last, self.prebatched,
                              self.rebatch, q),
                        daemon=True)
            for i in range(self.num_workers)
        ]
        for p in procs:
            p.start()
        live = self.num_workers
        buf: list[Any] = []  # rebatch sample buffer
        try:
            while live:
                try:
                    kind, payload = q.get(timeout=600)
                except queue_mod.Empty:  # pragma: no cover
                    raise RuntimeError("data workers stalled for 600s")
                if kind == "batch":
                    yield payload
                elif kind == "chunk":
                    buf.extend(payload)
                    while len(buf) >= self.batch_size:
                        yield default_collate(buf[:self.batch_size])
                        buf = buf[self.batch_size:]
                elif kind == "end":
                    live -= 1
                else:
                    raise RuntimeError(f"data worker failed: {payload}")
            if buf and not self.drop_last:
                yield default_collate(buf)
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.join(timeout=5)


def device_prefetch(batches: Iterable[Any], sharding=None, depth: int = 2
                    ) -> Iterator[Any]:
    """Move batches to device ahead of consumption (async H2D overlap).

    ``sharding``: a NamedSharding (or pytree of them) for multi-device
    placement; None puts on the default device.
    """
    import jax

    def put(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        # jax.device_put broadcasts a single sharding over the batch pytree
        # or matches a pytree of shardings leaf-wise
        return jax.device_put(batch, sharding)

    buf: collections.deque = collections.deque()
    it = iter(batches)
    for b in itertools.islice(it, depth):
        buf.append(put(b))
    while buf:
        nxt = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield nxt
