"""Batch collation + background-thread prefetch (the DataLoader analog).

The reference feeds the GPU from torch DataLoader worker processes that run
the voxelizer scatter on CPU per sample (SURVEY.md §3.1 — a major input
bottleneck).  Here the host pipeline is a thin thread-prefetched collator;
the heavy op (voxelization) can run on device instead
(``events.events_to_voxel_grid`` is vmappable over padded event buffers).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


def collate(samples, round_up=None, _arena=None) -> Dict[str, np.ndarray]:
    """Stack a list of sample dicts into batched arrays (numeric keys only).

    Arrays whose shapes differ only in dim 0 (bucket-laddered event
    buffers, ``events.voxel.make_ladder``) are zero-padded to the batch
    max, mapped through ``round_up`` when given (e.g.
    ``lambda n: choose_bucket(n, ladder)``) — so batch shapes stay in a
    small static set and jit recompilation is bounded.

    ``_arena`` (used via :class:`ArenaCollate`) is a dict reused across
    calls: output buffers are allocated once per (key, shape, dtype) and
    refilled, which keeps their pages warm — the fresh-page faults of
    per-batch ``np.zeros``/``np.stack`` were ~4× the copy cost itself on
    the train input path (docs/PERF.md round 4)."""

    def _buf(key, shape, dtype):
        if _arena is None:
            return np.empty(shape, dtype)
        slot = _arena.get((key, shape, np.dtype(dtype)))
        if slot is None:
            slot = np.empty(shape, dtype)
            _arena[(key, shape, np.dtype(dtype))] = slot
        return slot

    out = {}
    for k in samples[0]:
        v0 = samples[0][k]
        if isinstance(v0, np.ndarray):
            arrs = [s[k] for s in samples]
            n0 = max(a.shape[0] for a in arrs)
            if round_up is not None and k.startswith("events"):
                n0 = int(round_up(n0))
            if any(a.shape[0] != n0 for a in arrs):
                assert all(a.shape[1:] == arrs[0].shape[1:] for a in arrs), (
                    f"collate: key '{k}' varies beyond dim 0"
                )
                padded = _buf(
                    k, (len(arrs), n0) + arrs[0].shape[1:], v0.dtype
                )
                for i, a in enumerate(arrs):
                    n = a.shape[0]
                    padded[i, :n] = a
                    padded[i, n:] = 0
                out[k] = padded
                continue
            stacked = _buf(k, (len(arrs),) + v0.shape, v0.dtype)
            for i, a in enumerate(arrs):
                stacked[i] = a
            out[k] = stacked
        elif isinstance(v0, (int, float, bool, np.integer, np.floating, np.bool_)):
            out[k] = np.asarray([s[k] for s in samples])
        else:
            out[k] = [s[k] for s in samples]  # e.g. names
    return out


class ArenaCollate:
    """``collate`` with rotating preallocated output buffers.

    ``slots`` independent arenas rotate per call so a batch still in
    flight (queued in ``prefetch``, or being transferred to device) is
    never overwritten: with prefetch depth d, a slot is refilled ``slots``
    batches after it was handed out, so ``slots >= d + 2`` leaves one full
    consumed-and-transferred batch of slack.  Buffer shapes come from the
    bucket-ladder rung set, so each arena holds at most a few entries.

    ALIASING CONTRACT (ADVICE r4): returned batches alias the rotating
    arenas — a consumer must not retain a raw batch beyond ``slots``
    subsequent calls (accumulating batches for eval/debug sees them
    silently mutate).  ``device_put``/``jnp.asarray`` to an ACCELERATOR is
    safe: PJRT keeps the host buffer immutable-until-transfer-completes
    and the transfer finishes well inside the ``slots`` window.  On the
    CPU backend JAX may ZERO-COPY alias aligned numpy buffers
    indefinitely (verified in tests/test_data.py), so the arena is
    DISABLED there at first call (plain fresh-allocation collate —
    page-warmth only matters on the TPU-host train path); ``force_arena``
    overrides for tests.  ``debug_poison=True`` fills a slot's buffers
    with NaN before reuse so a retained-reference bug surfaces as NaNs
    instead of silently-wrong data (tests; too slow for production).
    """

    def __init__(self, round_up=None, slots: int = 4,
                 debug_poison: bool = False, force_arena: bool = False):
        self.round_up = round_up
        self._arenas = [dict() for _ in range(max(1, slots))]
        self._i = 0
        self.debug_poison = debug_poison
        self._enabled = True if force_arena else None  # None = probe jax

    def _arena_enabled(self) -> bool:
        if self._enabled is None:
            try:
                import jax

                self._enabled = jax.default_backend() != "cpu"
            except Exception:
                self._enabled = True  # no jax → no jax-array aliasing risk
        return self._enabled

    def __call__(self, samples) -> Dict[str, np.ndarray]:
        if not self._arena_enabled():
            return collate(samples, round_up=self.round_up)
        arena = self._arenas[self._i]
        self._i = (self._i + 1) % len(self._arenas)
        if self.debug_poison:
            for key, buf in arena.items():
                if np.issubdtype(buf.dtype, np.floating):
                    buf.fill(np.nan)
        before = len(arena)
        out = collate(samples, round_up=self.round_up, _arena=arena)
        if len(arena) != before:
            # A new batch shape appeared: allocate AND PRE-FAULT its
            # buffers in every other slot now, not when rotation reaches
            # them.  A large fresh numpy mmap faulting inside the steady
            # loop can stall 100s of ms on this kernel (synchronous
            # compaction in a fragmented process — measured 0.4-5 s per
            # cold 25 MB slot, docs/PERF.md round 4); paying all slots'
            # faults at first sighting keeps the per-batch path warm.
            for key, buf in list(arena.items()):
                for other in self._arenas:
                    if key not in other:
                        fresh = np.empty(key[1], key[2])
                        fresh.fill(0)
                        other[key] = fresh
        return out


def batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    drop_last: bool = True,
    seed: int = 0,
    epochs: Optional[int] = None,
    process_index: int = 0,
    process_count: int = 1,
    collate_fn=collate,
) -> Iterator[Dict[str, np.ndarray]]:
    """Batches of ``batch_size`` samples per process.  Multi-host: every
    process draws the SAME shuffled order (same seed) and takes its
    interleaved slice, so global batches partition the dataset
    (``parallel.mesh.shard_batch`` assembles the global array)."""
    # Datasets in raw-events mode hand each sample 2 pooled pack buffers
    # (events.voxel.BufferPool) that collate copies only after the whole
    # batch is materialized — size the pool's ring from the batch so a
    # buffer is never recycled inside one batch window (default ring=16
    # silently corrupts batches of >8 samples sharing a bucket).
    pool = getattr(dataset, "_pack_pool", None)
    if pool is not None and hasattr(pool, "ensure_ring"):
        pool.ensure_ring(2 * batch_size + 4)
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = np.arange(len(dataset))
        if shuffle:
            rng.shuffle(order)
        if process_count > 1:
            # truncate to a common multiple first: every process must yield
            # the SAME number of batches, or the jitted step on the process
            # with one extra batch hangs waiting for shards that never come
            n_even = (len(order) // process_count) * process_count
            order = order[:n_even][process_index::process_count]
        for i in range(0, len(order), batch_size):
            idx = order[i : i + batch_size]
            if drop_last and len(idx) < batch_size:
                break
            yield collate_fn([dataset[int(j)] for j in idx])
        epoch += 1


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Run the iterator in a background thread with a bounded queue so host
    data prep overlaps device compute."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        # a dataset read error must reach the consumer — swallowing it
        # would end the stream early and let the run "finish" truncated
        try:
            for item in iterator:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
