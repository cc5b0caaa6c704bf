"""Visualization suite parity — the reference's event/flow overlay
visualizer, KITTI-style flow-error image, GIF writer, and the train-loop
every-N-iters visualization hook.

  * ``events_overlay_image``  — events drawn over an image (reference
    ``utils/visualization.py:96-160`` FlowVisualizerEvents.visualize_events
    + ``events_to_event_image:276``: red = negative, blue = positive,
    majority vote per pixel).
  * ``flow_error_image``      — KITTI devkit log-color error map (reference
    ``utils_luo/tools.py:2544-2599`` flow_error_image_np).
  * ``create_gif``            — imageio GIF writer (reference
    ``tools.py:2366-2371``).
  * ``FlowVisualizerEvents``  — writes gt flow (masked), estimated flow
    (clamped to the gt color scaling), masked estimation and the event
    overlay per visualized sample (reference visualize_ground_truths /
    visualize_estimations, ``utils/visualization.py:128-160``).
  * ``make_train_viz_hook``   — the reference's every-100-iters train-loop
    dump (``train_mvsec.py:263-276``), pluggable into ``Trainer(viz_hook=)``.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np

from eemflow_tpu.viz.flow_viz import flow_to_image, visualize_optical_flow


def _imwrite(path: str, img: np.ndarray) -> bool:
    try:
        import cv2

        cv2.imwrite(path, img)
        return True
    except ImportError:
        try:
            from PIL import Image

            Image.fromarray(img[..., ::-1]).save(path)  # BGR → RGB
            return True
        except ImportError:
            return False


def events_overlay_image(
    events: np.ndarray,
    height: int,
    width: int,
    background: Optional[np.ndarray] = None,
) -> np.ndarray:
    """[N,4] (t,x,y,p) events over a background image → BGR uint8.

    Per-pixel majority vote between polarities (reference
    ``events_to_event_image``: red where negatives ≥ positives and any
    negative, blue where positives dominate)."""
    if background is None:
        img = np.full((height, width, 3), 255, np.uint8)
    else:
        bg = np.asarray(background)
        if bg.ndim == 2:
            bg = np.tile(bg[..., None], (1, 1, 3))
        bg = bg - bg.min()
        bg = (bg / max(bg.max(), 1e-8) * 255).astype(np.uint8)
        img = np.ascontiguousarray(bg)

    neg_mask = events[:, 3] == -1.0
    pos, _, _ = np.histogram2d(
        events[~neg_mask, 1], events[~neg_mask, 2],
        bins=(width, height), range=[[0, width], [0, height]],
    )
    neg, _, _ = np.histogram2d(
        events[neg_mask, 1], events[neg_mask, 2],
        bins=(width, height), range=[[0, width], [0, height]],
    )
    red = ((neg >= pos) & (neg != 0)).T
    blue = (pos > neg).T
    img[red] = (0, 0, 255)  # negative → red (BGR)
    img[blue] = (255, 0, 0)  # positive → blue
    return img


# KITTI devkit log-color map: (lo, hi, r, g, b) per error band
_KITTI_COLORMAP = np.asarray(
    [
        [0, 0.0625, 49, 54, 149],
        [0.0625, 0.125, 69, 117, 180],
        [0.125, 0.25, 116, 173, 209],
        [0.25, 0.5, 171, 217, 233],
        [0.5, 1, 224, 243, 248],
        [1, 2, 254, 224, 144],
        [2, 4, 253, 174, 97],
        [4, 8, 244, 109, 67],
        [8, 16, 215, 48, 39],
        [16, 1e9, 165, 0, 38],
    ],
    np.float32,
)


def flow_error_image(
    flow_pred: np.ndarray,
    flow_gt: np.ndarray,
    mask_occ: np.ndarray,
    mask_noc: Optional[np.ndarray] = None,
    log_colors: bool = True,
) -> np.ndarray:
    """KITTI-style flow-error visualization → BGR float image in [0,1]
    (reference ``flow_error_image_np``, ``utils_luo/tools.py:2544-2599``).

    mask_occ: [H,W,1] validity (1 at valid pixels); mask_noc: 1 only at
    valid non-occluded pixels (defaults to all-ones)."""
    h, w, _ = flow_pred.shape
    mask_occ = np.asarray(mask_occ, np.float32).reshape(h, w, 1)
    mask_noc = (
        np.ones_like(mask_occ) if mask_noc is None
        else np.asarray(mask_noc, np.float32).reshape(h, w, 1)
    )
    diff = np.sqrt(np.sum((flow_pred - flow_gt) ** 2, axis=2, keepdims=True))
    if log_colors:
        cmap = _KITTI_COLORMAP.copy()
        cmap[:, 2:5] /= 255.0
        mag = np.sqrt(np.sum(flow_gt**2, axis=2, keepdims=True))
        error = np.minimum(diff / 3, 20 * diff / (mag + 1e-7))
        im = np.zeros((h, w, 3), np.float32)
        for lo, hi, r, g, b in cmap:
            cond = (error >= lo) & (error < hi)
            im = np.where(np.tile(cond, (1, 1, 3)), np.asarray([r, g, b]), im)
        im = np.where(np.tile(mask_noc == 1, (1, 1, 3)), im, im * 0.5)
        im = im * mask_occ
    else:
        error = (np.minimum(diff, 5) / 5) * mask_occ
        im = np.concatenate([error, error * mask_noc, error * mask_noc], axis=2)
    return im[:, :, ::-1]


def create_gif(frames: Sequence[np.ndarray], gif_path: str,
               duration: float = 0.5) -> bool:
    """Write frames (uint8 images) as a GIF (reference create_gif,
    ``tools.py:2366``).  Returns False if imageio is unavailable."""
    try:
        import imageio
    except ImportError:
        return False
    imageio.mimsave(gif_path, list(frames), "GIF", duration=duration)
    return True


class FlowVisualizerEvents:
    """Per-sample flow/event dumps with the reference's file naming and
    gt-clamped color scaling (``utils/visualization.py:96-160``)."""

    def __init__(self, save_path: str, clamp_flow: bool = True):
        self.save_path = save_path
        self.clamp_flow = clamp_flow
        os.makedirs(save_path, exist_ok=True)

    def _write(self, name: str, img: np.ndarray) -> None:
        _imwrite(os.path.join(self.save_path, name), img)

    def visualize_sample(
        self,
        idx,
        flow_gt: Optional[np.ndarray] = None,
        flow_est: Optional[np.ndarray] = None,
        valid: Optional[np.ndarray] = None,
        events: Optional[np.ndarray] = None,
        image: Optional[np.ndarray] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
    ) -> None:
        max_flow = None
        if flow_gt is not None:
            gt = np.asarray(flow_gt, np.float32).copy()
            if valid is not None:
                gt[np.asarray(valid) < 0.5] = 0.0
            max_flow = float(np.sqrt((gt**2).sum(-1)).max())
            self._write(f"{idx}_flow_gt.jpg", flow_to_image(gt))
        if flow_est is not None:
            est = np.asarray(flow_est, np.float32)
            scale = max_flow if self.clamp_flow else None
            self._write(f"{idx}_flow_est.jpg", flow_to_image(est, scale))
            if valid is not None:
                masked = est.copy()
                masked[np.asarray(valid) < 0.5] = 0.0
                self._write(f"{idx}_flow_est_masked.jpg",
                            flow_to_image(masked, scale))
        if events is not None:
            h = height or (flow_gt.shape[0] if flow_gt is not None else None)
            w = width or (flow_gt.shape[1] if flow_gt is not None else None)
            if h and w:
                self._write(
                    f"{idx}_events.jpg",
                    events_overlay_image(np.asarray(events), h, w, image),
                )
        if flow_gt is not None and flow_est is not None and valid is not None:
            err = flow_error_image(
                np.asarray(flow_est, np.float32),
                np.asarray(flow_gt, np.float32),
                np.asarray(valid, np.float32)[..., None],
            )
            self._write(f"{idx}_error.jpg", (err * 255).astype(np.uint8))


def _normalize_map(m: np.ndarray) -> np.ndarray:
    m = m - m.min()
    return (m / max(m.max(), 1e-8) * 255).astype(np.uint8)


def make_train_viz_hook(save_path: str, model=None, family="two_volume",
                        preprocess=None) -> Callable:
    """Build a Trainer viz_hook: every ``viz_every`` iters dump gt flow,
    estimated flow and the channel-summed input maps for sample 0
    (reference ``train_mvsec.py:263-276``).  The hook recomputes a forward
    on the logged batch (outside the donated train step) — acceptable at
    the 1/100 duty cycle."""
    from eemflow_tpu.train.adapters import get_family

    viz = FlowVisualizerEvents(save_path)
    fam = get_family(family)

    def hook(state, batch, iters) -> None:
        if preprocess is not None:
            batch = preprocess(batch)
        flow_gt = np.asarray(batch["flow"][0]) if "flow" in batch else None
        valid = np.asarray(batch["valid"][0]) if "valid" in batch else None
        flow_est = None
        if model is not None:
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            outputs = model.apply(variables, *fam.model_args(batch))
            flow_est = np.asarray(fam.flow_est(outputs)[0])
        viz.visualize_sample(iters, flow_gt=flow_gt, flow_est=flow_est,
                             valid=valid)
        # input maps (reference vis_map_RGB of map_list[0/1])
        for key, tag in (("event_volume_old", "map1"), ("event_volume_new", "map2")):
            ev = batch.get(key)
            if ev is not None:
                m = _normalize_map(np.abs(np.asarray(ev[0])).sum(-1))
                _imwrite(
                    os.path.join(save_path, f"{iters}_{tag}.jpg"),
                    np.tile(m[..., None], (1, 1, 3)),
                )

    return hook
