"""DSEC dataset utilities (reference ``utils/dsec_utils.py`` +
``utils/visualization.py:76`` submission writer).

  * ``DSECVoxelGrid`` — the DSEC-style normalized voxel grid (same bilinear
    time voting as the canonical voxelizer; kept as an alias for API parity),
  * ``flow_16bit_to_float`` — DSEC 16-bit PNG flow decoding
    (reference ``dsec_utils.py:66-83``),
  * ``flow_to_16bit`` / ``write_flow_submission`` — the inverse encoding for
    benchmark submission files.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from eemflow_tpu.events.voxel import events_to_voxel_grid_np


class DSECVoxelGrid:
    """Callable voxelizer matching reference ``dsec_utils.VoxelGrid``."""

    def __init__(self, num_bins: int, height: int, width: int, normalize: bool = True):
        self.num_bins = num_bins
        self.height = height
        self.width = width
        self.normalize = normalize

    def __call__(self, events: np.ndarray) -> np.ndarray:
        """events: [N, 4] (t, x, y, p) sorted → [bins, H, W]."""
        return events_to_voxel_grid_np(
            events, self.num_bins, self.height, self.width, self.normalize
        )


def flow_16bit_to_float(flow_16bit: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[H, W, 3] uint16 (u, v, valid) → ([H, W, 2] float flow, [H, W] bool).

    Encoding: value = (flow + 2¹⁵) · 128 (reference dsec_utils.py:66-83)."""
    h, w, c = flow_16bit.shape
    assert c == 3
    valid = flow_16bit[..., 2] > 0
    flow = (flow_16bit[..., :2].astype(np.float64) - 2**15) / 128.0
    flow[~valid] = 0
    return flow.astype(np.float32), valid


def flow_to_16bit(flow: np.ndarray, valid: np.ndarray | None = None) -> np.ndarray:
    """Inverse of :func:`flow_16bit_to_float` for submission files."""
    h, w, _ = flow.shape
    out = np.zeros((h, w, 3), np.uint16)
    out[..., :2] = np.clip(flow * 128.0 + 2**15, 0, 2**16 - 1).astype(np.uint16)
    out[..., 2] = 1 if valid is None else valid.astype(np.uint16)
    return out


def write_flow_submission(flow: np.ndarray, path: str) -> None:
    """16-bit PNG submission writer (reference
    ``visualization.py:76 visualize_flow_submission`` semantics)."""
    import cv2

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    encoded = flow_to_16bit(flow)
    # PNG stores BGR; keep channel order consistent with the decoder
    cv2.imwrite(path, encoded[..., ::-1])
