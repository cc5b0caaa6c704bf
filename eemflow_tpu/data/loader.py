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


def collate(samples) -> Dict[str, np.ndarray]:
    """Stack a list of sample dicts into batched arrays (numeric keys only).

    Arrays whose shapes differ only in dim 0 (bucket-laddered event
    buffers, ``events.voxel.make_ladder``) are zero-padded to the batch
    max — the max is itself a ladder rung, so batch shapes stay in a small
    static set and jit recompilation is bounded."""
    out = {}
    for k in samples[0]:
        v0 = samples[0][k]
        if isinstance(v0, np.ndarray):
            arrs = [s[k] for s in samples]
            n0 = max(a.shape[0] for a in arrs)
            if any(a.shape[0] != n0 for a in arrs):
                assert all(a.shape[1:] == arrs[0].shape[1:] for a in arrs), (
                    f"collate: key '{k}' varies beyond dim 0"
                )
                padded = np.zeros((len(arrs), n0) + arrs[0].shape[1:], v0.dtype)
                for i, a in enumerate(arrs):
                    padded[i, : a.shape[0]] = a
                out[k] = padded
                continue
            out[k] = np.stack(arrs)
        elif isinstance(v0, (int, float, bool, np.integer, np.floating, np.bool_)):
            out[k] = np.asarray([s[k] for s in samples])
        else:
            out[k] = [s[k] for s in samples]  # e.g. names
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
) -> Iterator[Dict[str, np.ndarray]]:
    """Batches of ``batch_size`` samples per process.  Multi-host: every
    process draws the SAME shuffled order (same seed) and takes its
    interleaved slice, so global batches partition the dataset
    (``parallel.mesh.shard_batch`` assembles the global array)."""
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
            yield collate([dataset[int(j)] for j in idx])
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
