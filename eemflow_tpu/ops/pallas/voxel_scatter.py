"""Pallas TPU kernel: event → voxel-grid scatter accumulation.

The voxelizer (``events.voxel.events_to_voxel_grid``) is two XLA
scatter-adds of N scalar updates each — measured update-count-bound at
~10 ns/update and 56% of the worst-case EEMFlow train step
(docs/PROFILE_r2.md).  Round 2's formulation study *extrapolated* that a
Pallas kernel "would serialize at a similar rate"; this kernel exists to
MEASURE that claim (VERDICT r2 item 3).

Design: timestamps are sorted, so the time-bin index ``⌊ts⌋`` is
monotonic over the event array and each output bin's votes come from two
contiguous event ranges (left votes: ``tis == b``; right votes:
``tis == b-1``).  The grid iterates over bins; each program

  * receives the four range boundaries via scalar prefetch
    (``jnp.searchsorted`` on the host-of-device side, fused into the
    surrounding jit),
  * accumulates its [H, W] plane in a VMEM scratch with per-event
    dynamic-index read-modify-writes,
  * writes the plane to the output block.

The per-event VMEM RMW is the measured quantity: if Mosaic's scalar
dynamic stores beat XLA's HBM scatter rate the kernel wins; the verdict
is recorded in docs/PERF.md either way.  Exactness: identical vote
values/ordering per bin as the XLA path up to addition order (fp32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ranges_ref, flat_ref, val_l_ref, val_r_ref, out_ref, *, width: int):
    """One program per (batch, bin): accumulate the bin's [H, W] plane.

    ranges_ref (SMEM, scalar-prefetched): [B, bins, 4] — for this bin,
    (left_start, left_end, right_start, right_end) event indices.
    flat_ref / val_*_ref: full [N] event columns in VMEM.
    out_ref: the [H, W] plane block.
    """
    b = pl.program_id(0)
    k = pl.program_id(1)

    out_ref[...] = jnp.zeros_like(out_ref)

    def accumulate(start, end, val_ref):
        def body(i, _):
            f = flat_ref[0, i]
            y = f // width
            x = f - y * width
            out_ref[0, 0, y, x] += val_ref[0, i]
            return 0

        jax.lax.fori_loop(start, end, body, 0)

    accumulate(ranges_ref[b, k, 0], ranges_ref[b, k, 1], val_l_ref)
    accumulate(ranges_ref[b, k, 2], ranges_ref[b, k, 3], val_r_ref)


@functools.partial(
    jax.jit, static_argnames=("num_bins", "height", "width", "interpret")
)
def voxel_scatter_pallas(
    events: jax.Array,
    n_valid: jax.Array,
    num_bins: int,
    height: int,
    width: int,
    interpret: bool = False,
) -> jax.Array:
    """[B, N, 4] padded (t, x, y, p) events + [B] counts → [B, bins, H, W]
    UNNORMALIZED voxel grid (the caller applies ``normalize_voxel_grid``).

    Vote semantics identical to ``events.voxel.events_to_voxel_grid``.
    """
    B, N, _ = events.shape

    t = events[..., 0]
    xs = events[..., 1].astype(jnp.int32)
    ys = events[..., 2].astype(jnp.int32)
    pols = jnp.where(events[..., 3] == 0, -1.0, events[..., 3])

    idx = jnp.arange(N)[None, :]
    valid = idx < n_valid[:, None]

    first = t[:, :1]
    last = jnp.take_along_axis(t, jnp.maximum(n_valid - 1, 0)[:, None], axis=1)
    deltaT = jnp.where(last - first == 0, 1.0, last - first)
    ts = (num_bins - 1) * (t - first) / deltaT
    tis = jnp.floor(ts)
    tis_i = tis.astype(jnp.int32)
    dts = ts - tis

    inb = (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height) & valid
    # out-of-frame / padded events keep their (monotonic) time bin but vote 0
    val_l = jnp.where(inb & (tis >= 0) & (tis < num_bins), pols * (1.0 - dts), 0.0)
    val_r = jnp.where(inb & (tis >= 0) & (tis + 1 < num_bins), pols * dts, 0.0)
    flat = jnp.clip(ys, 0, height - 1) * width + jnp.clip(xs, 0, width - 1)

    # padded tail: n_valid ≤ i — force bin = num_bins so searchsorted puts
    # the padding after every real range (its votes are already zeroed)
    tis_key = jnp.where(valid, jnp.clip(tis_i, 0, num_bins), num_bins)

    bounds = jax.vmap(
        lambda row: jnp.searchsorted(row, jnp.arange(num_bins + 1))
    )(tis_key).astype(jnp.int32)  # [B, bins+1]
    # bin k: left votes from tis==k, right votes from tis==k-1
    left_start = bounds[:, :-1]
    left_end = bounds[:, 1:]
    right_start = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), bounds[:, :-2]], axis=1
    )
    right_end = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), bounds[:, 1:-1]], axis=1
    )
    ranges = jnp.stack([left_start, left_end, right_start, right_end], axis=-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, num_bins),
        in_specs=[
            pl.BlockSpec((1, N), lambda b, k, r: (b, 0)),
            pl.BlockSpec((1, N), lambda b, k, r: (b, 0)),
            pl.BlockSpec((1, N), lambda b, k, r: (b, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, height, width), lambda b, k, r: (b, k, 0, 0)
        ),
    )

    def kernel(ranges_ref, flat_ref, vl_ref, vr_ref, out_ref):
        _kernel(ranges_ref, flat_ref, vl_ref, vr_ref, out_ref, width=width)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, num_bins, height, width), jnp.float32),
        interpret=interpret,
    )(ranges, flat, val_l, val_r)
