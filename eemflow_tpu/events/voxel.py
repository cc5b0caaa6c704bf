"""Event-stream → voxel-grid binning, the framework-defining op.

Semantics (reference ``loader/loader_utils.py:429-537``,
``EventSequenceToVoxelGrid_Pytorch``, itself credited to rpg_e2vid): events
(t, x, y, p) vote bilinearly in *time* into a [num_bins, H, W] grid:

  * timestamps normalized to ``(num_bins-1)·(t−t₀)/ΔT`` (ΔT→1 if zero),
  * polarity ±1 (p==0 mapped to −1),
  * each event adds ``p·(1−dt)`` to bin ⌊ts⌋ and ``p·dt`` to bin ⌊ts⌋+1
    (two scatter-adds with bounds masks),
  * optional normalization: over *nonzero* cells only, subtract mean and
    divide by the sample std (ddof=1, matching ``torch.std``); if std is 0 or
    undefined (≤1 nonzero cell) only the mean is subtracted.

TPU-native design: the reference runs this per-sample on dataloader worker
CPUs (a major input-pipeline bottleneck at 10⁵-10⁶ events/frame).  Here it is
a fixed-shape XLA scatter-add that runs **on device**, vmappable over a batch
of padded event tensors — events are padded to a static bucket size with a
valid-count, so recompilation is bounded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pad_events(
    events: np.ndarray, bucket_size: int
) -> tuple[np.ndarray, int, int]:
    """Pad/truncate an [N,4] float event array to [bucket_size, 4].

    Returns (padded_events float32, n_valid, n_dropped).  ``n_dropped > 0``
    means the bucket is too small and the voxel grid will silently lose
    events — callers must surface it (the production loaders count and
    warn; see ``data.device_input.EventOverflowCounter``).  Events must be
    time-sorted; timestamps should already be relative (float64 upstream)
    so float32 is precise enough.
    """
    n = min(len(events), bucket_size)
    out = np.empty((bucket_size, 4), dtype=np.float32)
    out[:n] = events[:n]
    out[n:] = 0.0
    return out, n, len(events) - n


class BufferPool:
    """Rotating per-shape float32 buffer pool for event pack buffers.

    A 4 MB ``np.empty`` each ``__getitem__`` is an mmap whose pages fault
    cold on every fill; recycling ``ring`` buffers per bucket keeps pages
    warm (~4× the copy cost on the train input path, docs/PERF.md round
    4).  A buffer handed out is overwritten again only after ``ring``
    further requests of the same bucket — callers (dataset ``_raw`` →
    ``collate``) consume it within the same prefetch iteration, so the
    default ring is generous.  NOT thread-safe; use one pool per loader
    thread."""

    def __init__(self, ring: int = 16):
        self.ring = max(2, ring)
        self._pool: dict = {}
        self._next: dict = {}

    def ensure_ring(self, ring: int) -> None:
        """Grow the ring (never shrinks).  A buffer handed out is
        overwritten after ``ring`` further requests of the same bucket, so
        any consumer that holds more than ``ring`` live buffers at once
        reads silently corrupted data — ``batch_iterator`` sizes the ring
        as ``2*batch_size + 4`` (datasets hand out two pack buffers per
        sample and collate copies them only once the whole batch is
        materialized)."""
        ring = max(self.ring, ring)
        if ring == self.ring:
            return
        self.ring = ring
        for bucket, lst in self._pool.items():
            while len(lst) < ring:
                buf = np.empty((bucket, 4), np.float32)
                buf.fill(0.0)
                lst.append(buf)

    def get(self, bucket: int) -> np.ndarray:
        ring = self._pool.get(bucket)
        if ring is None:
            # allocate AND pre-fault the whole ring at first sighting of a
            # bucket: a large fresh numpy mmap faulting mid-loop can stall
            # 100s of ms on this kernel (synchronous compaction in a
            # fragmented process — docs/PERF.md round 4); one warmup-time
            # cost beats `ring` scattered steady-state stalls
            ring = self._pool[bucket] = []
            self._next[bucket] = 0
            for _ in range(self.ring):
                buf = np.empty((bucket, 4), np.float32)
                buf.fill(0.0)
                ring.append(buf)
        i = self._next[bucket]
        self._next[bucket] = (i + 1) % self.ring
        return ring[i]


def make_ladder(bucket_size: int, n_rungs: int = 4) -> tuple:
    """Geometric bucket ladder ``(bucket/2^(r-1), ..., bucket/2, bucket)``.

    The scatter voxelizer's cost is bounded by the bucket size, and at the
    worst-case bucket it is ~56% of the EEMFlow train step (docs/
    PROFILE_r2.md) — while real HREM frames carry 3-8× fewer events than
    the bucket (docs/PERF.md).  Padding each sample to the smallest rung
    that fits trades a bounded number of extra step compiles (one per rung
    shape) for proportionally less scatter work on every step."""
    assert n_rungs >= 1
    return tuple(max(1, bucket_size >> (n_rungs - 1 - i)) for i in range(n_rungs))


def choose_bucket(n: int, ladder) -> int:
    """Smallest ladder rung ≥ n; the largest rung if none fits (the caller
    truncates to it and must count the overflow)."""
    for b in ladder:
        if n <= b:
            return int(b)
    return int(ladder[-1])


@functools.partial(jax.jit, static_argnames=("num_bins", "height", "width", "normalize"))
def events_to_voxel_grid(
    events: jax.Array,
    n_valid: jax.Array,
    num_bins: int,
    height: int,
    width: int,
    normalize: bool = True,
) -> jax.Array:
    """events: [N, 4] (t, x, y, p) float32, time-sorted, first n_valid real.

    Returns [num_bins, height, width] float32.
    """
    N = events.shape[0]
    idx = jnp.arange(N)
    valid = idx < n_valid

    t = events[:, 0]
    xs = events[:, 1].astype(jnp.int32)
    ys = events[:, 2].astype(jnp.int32)
    pols = jnp.where(events[:, 3] == 0, -1.0, events[:, 3])

    first = t[0]
    last = t[jnp.maximum(n_valid - 1, 0)]
    deltaT = last - first
    deltaT = jnp.where(deltaT == 0, 1.0, deltaT)

    ts = (num_bins - 1) * (t - first) / deltaT
    tis = jnp.floor(ts)
    tis_i = tis.astype(jnp.int32)
    dts = ts - tis
    vals_left = pols * (1.0 - dts)
    vals_right = pols * dts

    hw = height * width
    base = xs + ys * width
    # out-of-frame coordinates (e.g. rectified DSEC events) must not vote —
    # without this, x==width lands on pixel (0, y+1) via the flat index
    inb = (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height)
    valid = valid & inb

    mask_l = valid & (tis < num_bins) & (tis >= 0)
    idx_l = jnp.where(mask_l, base + tis_i * hw, 0)
    val_l = jnp.where(mask_l, vals_left, 0.0)

    mask_r = valid & (tis + 1 < num_bins) & (tis >= 0)
    idx_r = jnp.where(mask_r, base + (tis_i + 1) * hw, 0)
    val_r = jnp.where(mask_r, vals_right, 0.0)

    grid = jnp.zeros((num_bins * hw,), jnp.float32)
    grid = grid.at[idx_l].add(val_l)
    grid = grid.at[idx_r].add(val_r)
    grid = grid.reshape(num_bins, height, width)

    if normalize:
        grid = normalize_voxel_grid(grid)
    return grid


@functools.partial(
    jax.jit,
    static_argnames=("num_bins", "height", "width", "normalize", "dtype"),
)
def events_to_voxel_grid_fused(
    events: jax.Array,
    n_valid: jax.Array,
    num_bins: int,
    height: int,
    width: int,
    normalize: bool = True,
    dtype=jnp.float32,
) -> jax.Array:
    """Scatter-formulation experiment: the left and right vote streams
    combined into ONE scatter-add (and, optionally, accumulated at
    reduced precision).

    The jax.profiler trace of the b=6 2^18-bucket train step (round 5,
    docs/traces) shows XLA lowering EACH ``.at[].add`` as
    sort(idx,val) → sorted-apply custom fusion at ~8.7 ns/update, with
    the four applies costing 54.8 ms of the 97 ms step.  This variant:

      * halves the op count (one sort + one apply per grid instead of
        two) — per-cell sums re-associate, so it is fp-reordering-level
        different from the production path (same vote values; the banked
        variant's tolerance class);
      * with ``dtype=bfloat16`` also halves the apply's read-modify-write
        bytes — vote sums then carry bf16 rounding (~1% at hot cells),
        which is inside the documented ``mixed_precision`` training
        contract (the volumes are cast to bf16 for the forward anyway).

    Opt-in (hardware A/B via tools/tpu_battery.py); the production
    ``events_to_voxel_grid`` is unchanged and stays the parity path.
    """
    N = events.shape[0]
    idx = jnp.arange(N)
    valid = idx < n_valid

    t = events[:, 0]
    xs = events[:, 1].astype(jnp.int32)
    ys = events[:, 2].astype(jnp.int32)
    pols = jnp.where(events[:, 3] == 0, -1.0, events[:, 3])

    first = t[0]
    last = t[jnp.maximum(n_valid - 1, 0)]
    deltaT = last - first
    deltaT = jnp.where(deltaT == 0, 1.0, deltaT)

    ts = (num_bins - 1) * (t - first) / deltaT
    tis = jnp.floor(ts)
    tis_i = tis.astype(jnp.int32)
    dts = ts - tis
    vals_left = pols * (1.0 - dts)
    vals_right = pols * dts

    hw = height * width
    base = xs + ys * width
    inb = (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height)
    valid = valid & inb

    mask_l = valid & (tis < num_bins) & (tis >= 0)
    idx_l = jnp.where(mask_l, base + tis_i * hw, 0)
    val_l = jnp.where(mask_l, vals_left, 0.0)

    mask_r = valid & (tis + 1 < num_bins) & (tis >= 0)
    idx_r = jnp.where(mask_r, base + (tis_i + 1) * hw, 0)
    val_r = jnp.where(mask_r, vals_right, 0.0)

    idx_all = jnp.concatenate([idx_l, idx_r])
    val_all = jnp.concatenate([val_l, val_r]).astype(dtype)
    grid = jnp.zeros((num_bins * hw,), dtype)
    grid = grid.at[idx_all].add(val_all)
    grid = grid.astype(jnp.float32).reshape(num_bins, height, width)

    if normalize:
        grid = normalize_voxel_grid(grid)
    return grid


def events_to_voxel_grid_banked(
    events: jax.Array,
    n_valid: jax.Array,
    num_bins: int,
    height: int,
    width: int,
    banks: int = 4,
    normalize: bool = True,
) -> jax.Array:
    """Bank-split scatter formulation (perf experiment, same votes).

    The production scatter serializes all ~2N updates through one
    [bins·H·W] buffer; here the event stream is split into ``banks``
    contiguous chunks, each scattered into its own buffer (one batched
    scatter), then summed.  If TPU scatter throughput is limited by
    serialization on a single output buffer rather than by update count,
    banks should trade a bins·H·W·banks reduction for parallel scatter
    lanes.  Parity vs the production path is to fp addition reordering
    (votes are identical; per-cell sums associate differently).

    Falls back to the production path when N % banks != 0.
    """
    N = events.shape[0]
    if N % banks or banks == 1:
        return events_to_voxel_grid(events, n_valid, num_bins, height,
                                    width, normalize)
    idx = jnp.arange(N)
    valid = idx < n_valid

    t = events[:, 0]
    xs = events[:, 1].astype(jnp.int32)
    ys = events[:, 2].astype(jnp.int32)
    pols = jnp.where(events[:, 3] == 0, -1.0, events[:, 3])

    first = t[0]
    last = t[jnp.maximum(n_valid - 1, 0)]
    deltaT = last - first
    deltaT = jnp.where(deltaT == 0, 1.0, deltaT)

    ts = (num_bins - 1) * (t - first) / deltaT
    tis = jnp.floor(ts)
    tis_i = tis.astype(jnp.int32)
    dts = ts - tis

    hw = height * width
    base = xs + ys * width
    inb = (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height)
    valid = valid & inb

    mask_l = valid & (tis < num_bins) & (tis >= 0)
    idx_l = jnp.where(mask_l, base + tis_i * hw, 0)
    val_l = jnp.where(mask_l, pols * (1.0 - dts), 0.0)
    mask_r = valid & (tis + 1 < num_bins) & (tis >= 0)
    idx_r = jnp.where(mask_r, base + (tis_i + 1) * hw, 0)
    val_r = jnp.where(mask_r, pols * dts, 0.0)

    # [banks, 2·N/banks] per-bank update streams, one batched scatter
    all_idx = jnp.concatenate([idx_l, idx_r]).reshape(banks * 2, N // banks)
    all_val = jnp.concatenate([val_l, val_r]).reshape(banks * 2, N // banks)
    zeros = jnp.zeros((num_bins * hw,), jnp.float32)
    grids = jax.vmap(lambda i, v: zeros.at[i].add(v))(all_idx, all_val)
    grid = grids.sum(axis=0).reshape(num_bins, height, width)

    if normalize:
        grid = normalize_voxel_grid(grid)
    return grid


def normalize_voxel_grid(grid: jax.Array) -> jax.Array:
    """Per-nonzero mean/std normalization (sample std, ddof=1)."""
    nz = grid != 0
    n = jnp.sum(nz)
    n_f = jnp.maximum(n, 1).astype(jnp.float32)
    mean = jnp.sum(grid) / n_f  # zeros contribute nothing to the sum
    var = jnp.sum(jnp.where(nz, (grid - mean) ** 2, 0.0)) / jnp.maximum(n - 1, 1)
    std = jnp.sqrt(var)
    use_std = (n > 1) & (std > 0)
    denom = jnp.where(use_std, std, 1.0)
    out = jnp.where(nz, (grid - mean) / denom, grid)
    return jnp.where(n > 0, out, grid)


def events_to_voxel_grid_np(
    events: np.ndarray,
    num_bins: int,
    height: int,
    width: int,
    normalize: bool = True,
) -> np.ndarray:
    """Host (numpy, float64) twin of :func:`events_to_voxel_grid` for loaders
    and golden tests. events: [N,4] (t, x, y, p), time-sorted."""
    grid = np.zeros(num_bins * height * width, dtype=np.float64)
    if len(events) > 0:
        t = events[:, 0].astype(np.float64)
        xs = events[:, 1].astype(np.int64)
        ys = events[:, 2].astype(np.int64)
        pols = events[:, 3].astype(np.float64).copy()
        pols[pols == 0] = -1

        deltaT = t[-1] - t[0]
        if deltaT == 0:
            deltaT = 1.0
        ts = (num_bins - 1) * (t - t[0]) / deltaT
        tis = np.floor(ts)
        dts = ts - tis
        tis_i = tis.astype(np.int64)
        vals_left = pols * (1.0 - dts)
        vals_right = pols * dts

        inb = (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height)
        m = inb & (tis < num_bins) & (tis >= 0)
        np.add.at(grid, xs[m] + ys[m] * width + tis_i[m] * width * height, vals_left[m])
        m = inb & (tis + 1 < num_bins) & (tis >= 0)
        np.add.at(
            grid, xs[m] + ys[m] * width + (tis_i[m] + 1) * width * height, vals_right[m]
        )

    grid = grid.reshape(num_bins, height, width)
    if normalize:
        nz = grid != 0
        n = nz.sum()
        if n > 0:
            mean = grid[nz].mean()
            std = grid[nz].std(ddof=1) if n > 1 else 0.0
            if std > 0:
                grid[nz] = (grid[nz] - mean) / std
            else:
                grid[nz] = grid[nz] - mean
    return grid.astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("num_bins", "height", "width", "normalize")
)
def events_to_voxel_grid_batch(
    events: jax.Array,
    n_valid: jax.Array,
    num_bins: int,
    height: int,
    width: int,
    normalize: bool = True,
) -> jax.Array:
    """Batched device voxelization: [B, N, 4] + [B] → [B, bins, H, W].

    The TPU-native input path (SURVEY.md §3.1): the reference voxelizes per
    sample on dataloader worker CPUs; here the host only pads raw events to
    a fixed bucket and the scatter-add runs vmapped on device."""
    fn = lambda e, n: events_to_voxel_grid(e, n, num_bins, height, width, normalize)
    return jax.vmap(fn)(events, n_valid)


def voxelize_batch_nhwc(
    events: jax.Array,
    n_valid: jax.Array,
    num_bins: int,
    height: int,
    width: int,
    normalize: bool = True,
    banks: int = 1,
) -> jax.Array:
    """[B, N, 4] + [B] → [B, H, W, bins] (NHWC, the model input layout).

    Unjitted on purpose: it is called *inside* the jitted train/eval step
    (``data.device_input.make_device_preprocess``) so voxelization fuses
    into the step executable.

    ``banks > 1`` uses the bank-split scatter (round-3 measured it 1.47×
    faster at banks=2; round 4 did NOT reproduce that — banks=1 wins
    2.34-2.43 vs 3.12-3.18 ms/frame across two clean sessions, so the
    production default is banks=1 — docs/PERF.md round 4); votes are
    identical but per-cell sums associate differently (fp-reordering-level
    difference vs banks=1).
    """
    if banks > 1:
        fn = lambda e, n: events_to_voxel_grid_banked(
            e, n, num_bins, height, width, banks=banks, normalize=normalize
        ).transpose(1, 2, 0)
    else:
        fn = lambda e, n: events_to_voxel_grid(
            e, n, num_bins, height, width, normalize
        ).transpose(1, 2, 0)
    return jax.vmap(fn)(events, n_valid)


def events_to_mask(
    events: jax.Array, n_valid: jax.Array, height: int, width: int
) -> jax.Array:
    """[N, 4] + count → [H, W, 1] float 0/1 event-presence mask — the
    device twin of the reference's coordinate histogram
    (``loader/MVSEC.py:132-142``, sparse-eval mask)."""
    N = events.shape[0]
    valid = jnp.arange(N) < n_valid
    xs = events[:, 1].astype(jnp.int32)
    ys = events[:, 2].astype(jnp.int32)
    inb = valid & (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height)
    idx = jnp.where(inb, xs + ys * width, 0)
    val = inb.astype(jnp.float32)
    # masked events scatter val 0.0 into cell 0 — no contamination
    hist = jnp.zeros((height * width,), jnp.float32).at[idx].add(val)
    return (hist > 0).astype(jnp.float32).reshape(height, width, 1)
