"""Evaluation metrics (reference ``test_mvsec.py:291-346`` ``flow_error``).

Masked AEE / outlier rates with the reference's exact protocol semantics:

  * GT mask: finite ∧ ‖gt‖ > 0,
  * sparse protocol: additionally mask to pixels with ≥1 event,
  * "is_car": outdoor MVSEC sequences evaluate rows < 190 only,
  * %1px = mean(EE < 1); %3px KITTI-style = mean((EE < 3) ∨ (EE < 0.1·‖gt‖)).

Host-side numpy (metrics accumulate per sample, like the reference).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def flow_error(
    flow_gt: np.ndarray,
    flow_pred: np.ndarray,
    event_img: Optional[np.ndarray] = None,
    is_car: bool = False,
    evaluation_type: str = "dense",
) -> Tuple[float, float, float, int, float, float, float]:
    """flow_gt/flow_pred: [H, W, 2]; event_img: [H, W] event count/sum map.

    Returns (AEE, %<1px, %<3px, n_points, EE_sum, AEE_gt, EE_gt_sum).

    Predictions at a lower resolution than GT (the spiking FlowNetS /
    STE-FlowNet heads emit sub-resolution flow) are scored against
    nearest-subsampled GT with UNSCALED values — the reference's
    ``downsample`` eval branch (``test_mvsec.py:119-128``:
    ``F.interpolate(flow, scale_factor=0.5)``, default nearest mode, no
    magnitude rescale), generalized to any integer-or-not ratio.
    """
    if flow_pred.shape[:2] != flow_gt.shape[:2]:
        gh, gw = flow_gt.shape[:2]
        ph, pw = flow_pred.shape[:2]
        ys = np.minimum((np.arange(ph) * gh / ph).astype(int), gh - 1)
        xs = np.minimum((np.arange(pw) * gw / pw).astype(int), gw - 1)
        flow_gt = flow_gt[ys][:, xs]
        if event_img is not None:
            ev = np.squeeze(np.asarray(event_img))
            event_img = ev[ys][:, xs]
        if is_car:
            # the 190-row crop is defined at GT resolution; rescale it
            is_car = False
            keep = int(np.ceil(190 * ph / gh))
            flow_gt = flow_gt[:keep]
            flow_pred = flow_pred[:keep]
            if event_img is not None:
                event_img = event_img[:keep]
    max_row = flow_gt.shape[0] if not is_car else 190
    gt = flow_gt[:max_row]
    pred = flow_pred[:max_row]

    mask = (
        np.isfinite(gt[..., 0])
        & np.isfinite(gt[..., 1])
        & (np.linalg.norm(gt, axis=-1) > 0)
    )
    if evaluation_type == "sparse":
        assert event_img is not None, "sparse protocol needs an event mask"
        ev = np.squeeze(np.asarray(event_img))[:max_row]
        mask = mask & (ev > 0)

    gt_m = gt[mask]
    pred_m = pred[mask]

    EE = np.linalg.norm(gt_m - pred_m, axis=-1)
    EE_gt = np.linalg.norm(gt_m, axis=-1)
    n_points = int(EE.shape[0])

    pct1 = float((EE < 1.0).sum() / (n_points + 1e-5))
    pct3 = float(((EE < 3.0) | (EE < 0.1 * EE_gt)).sum() / (n_points + 1e-5))

    if EE.sum() == 0:
        return 0.0, pct1, pct3, n_points, 0.0, 0.0, 0.0
    return (
        float(EE.mean()),
        pct1,
        pct3,
        n_points,
        float(EE.sum()),
        float(EE_gt.mean()),
        float(EE_gt.sum()),
    )
