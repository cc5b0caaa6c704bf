"""Differentiable per-event warping (reference
``utils_luo/event_utils.py:9-52`` ``warp_events_flow_torch``).

Each event (x, y, t, p) is advected by the flow sampled at its location,
scaled by its (normalized) timestamp: ``x' = x − flow_x(x, y)·t̂`` — the
motion-compensation primitive behind event-warping losses/visualizations.

TPU design: fixed-size padded event tensors + valid mask (same bucketing as
the voxelizer), bilinear flow sampling via the shared ``grid_sample_pixel``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from eemflow_tpu.ops.warp import grid_sample_pixel


def warp_events_flow(
    events: jax.Array,
    n_valid: jax.Array,
    flow: jax.Array,
    t_ref: Optional[jax.Array] = None,
) -> jax.Array:
    """events: [N, 4] (t, x, y, p) float32, first n_valid real; flow:
    [H, W, 2] (dx, dy).  Returns warped [N, 4] (same t, p; x, y advected).

    Timestamps are normalized to [0, 1] over the valid window (reference
    normalizes by the max timestamp); ``t_ref`` overrides the reference
    time (default: warp to the window start, t̂ = t_norm).
    """
    N = events.shape[0]
    t = events[:, 0]
    xs = events[:, 1]
    ys = events[:, 2]

    t_max = jnp.maximum(t[jnp.maximum(n_valid - 1, 0)], 1e-12)
    t_norm = t / t_max
    if t_ref is not None:
        t_norm = t_norm - t_ref

    fxy = grid_sample_pixel(
        flow[None], xs[None, :, None], ys[None, :, None], align_corners=True
    )[0, :, 0]  # [N, 2]

    valid = (jnp.arange(N) < n_valid).astype(events.dtype)
    new_x = xs - fxy[:, 0] * t_norm * valid
    new_y = ys - fxy[:, 1] * t_norm * valid
    return jnp.stack([t, new_x, new_y, events[:, 3]], axis=1)
