"""MVSEC GT-flow time propagation (offline encoder path).

Semantics (reference ``loader/loader_utils.py:70-161``): the GT flow maps
are not synchronized with the grayscale frames, so flow between two image
timestamps is synthesized by iteratively advecting a pixel grid through the
per-interval GT flow fields (nearest-neighbor remap), scaling the first and
last partial intervals, and zeroing pixels that ever sampled an
exactly-zero flow (the reference's out-of-frame proxy).
"""

from __future__ import annotations

import numpy as np


def _remap_nearest(img: np.ndarray, x_idx: np.ndarray, y_idx: np.ndarray) -> np.ndarray:
    """cv2.remap(..., INTER_NEAREST) equivalent: round coords, 0 outside."""
    try:
        import cv2

        return cv2.remap(
            img.astype(np.float32),
            x_idx.astype(np.float32),
            y_idx.astype(np.float32),
            cv2.INTER_NEAREST,
        )
    except ImportError:  # pragma: no cover - cv2 present in target env
        h, w = img.shape[:2]
        xi = np.floor(x_idx + 0.5).astype(np.int64)
        yi = np.floor(y_idx + 0.5).astype(np.int64)
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        out = np.zeros_like(img, dtype=np.float32)
        out[valid] = img[yi[valid], xi[valid]]
        return out


def prop_flow(x_flow, y_flow, x_indices, y_indices, x_mask, y_mask, scale_factor=1.0):
    """One advection step (in-place on indices/masks)."""
    fx = _remap_nearest(x_flow, x_indices, y_indices)
    fy = _remap_nearest(y_flow, x_indices, y_indices)
    x_mask[fx == 0] = False
    y_mask[fy == 0] = False
    x_indices += fx * scale_factor
    y_indices += fy * scale_factor


def estimate_corresponding_gt_flow(x_flow_in, y_flow_in, gt_timestamps, start_time, end_time):
    """Synthesize pixel-displacement flow between (start_time, end_time).

    x_flow_in/y_flow_in: [T, H, W] stacks of per-interval GT flow;
    gt_timestamps: [T] interval start times.  Returns (x_shift, y_shift).
    """
    x_flow_in = np.asarray(x_flow_in, dtype=np.float64)
    y_flow_in = np.asarray(y_flow_in, dtype=np.float64)
    gt_timestamps = np.asarray(gt_timestamps, dtype=np.float64)

    gt_iter = np.searchsorted(gt_timestamps, start_time, side="right") - 1
    gt_dt = gt_timestamps[gt_iter + 1] - gt_timestamps[gt_iter]
    x_flow = np.squeeze(x_flow_in[gt_iter])
    y_flow = np.squeeze(y_flow_in[gt_iter])

    dt = end_time - start_time
    if gt_dt > dt:
        # desired window inside one GT interval: linear scaling suffices
        return x_flow * dt / gt_dt, y_flow * dt / gt_dt

    x_indices, y_indices = np.meshgrid(
        np.arange(x_flow.shape[1]), np.arange(x_flow.shape[0])
    )
    x_indices = x_indices.astype(np.float32)
    y_indices = y_indices.astype(np.float32)
    orig_x = x_indices.copy()
    orig_y = y_indices.copy()
    x_mask = np.ones(x_indices.shape, dtype=bool)
    y_mask = np.ones(y_indices.shape, dtype=bool)

    # first (partial) interval
    scale = (gt_timestamps[gt_iter + 1] - start_time) / gt_dt
    prop_flow(x_flow, y_flow, x_indices, y_indices, x_mask, y_mask, scale)
    gt_iter += 1

    # full intervals
    while gt_timestamps[gt_iter + 1] < end_time:
        x_flow = np.squeeze(x_flow_in[gt_iter])
        y_flow = np.squeeze(y_flow_in[gt_iter])
        prop_flow(x_flow, y_flow, x_indices, y_indices, x_mask, y_mask)
        gt_iter += 1

    # last (partial) interval
    final_dt = end_time - gt_timestamps[gt_iter]
    final_gt_dt = gt_timestamps[gt_iter + 1] - gt_timestamps[gt_iter]
    x_flow = np.squeeze(x_flow_in[gt_iter])
    y_flow = np.squeeze(y_flow_in[gt_iter])
    prop_flow(x_flow, y_flow, x_indices, y_indices, x_mask, y_mask, final_dt / final_gt_dt)

    x_shift = x_indices - orig_x
    y_shift = y_indices - orig_y
    x_shift[~x_mask] = 0
    y_shift[~y_mask] = 0
    return x_shift, y_shift
