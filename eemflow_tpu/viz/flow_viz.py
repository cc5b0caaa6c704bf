"""Flow / event visualization (single canonical copy of the reference's four
colorizers: ``utils_luo/flow_viz_util.py``, ``tensor_tools.flow_to_image_*``,
``utils/visualization.py``, ``HREM.py:104-126``).

Two color codes are provided because the reference uses both:
  * Middlebury colorwheel (``flow_to_image``) — classic 55-color wheel,
  * HSV angle/magnitude map (``visualize_optical_flow``) — the HREM loader's
    scheme (hue = direction, value = √magnitude normalized), returned as BGR
    uint8 to diff against reference dumps pixel-for-pixel.
"""

from __future__ import annotations

import numpy as np


def _make_colorwheel() -> np.ndarray:
    """Middlebury color wheel (55×3, uint8 ranges)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col : col + MR, 0] = 255
    return wheel


_COLORWHEEL = _make_colorwheel()


def flow_to_image(flow: np.ndarray, max_flow: float | None = None) -> np.ndarray:
    """[H, W, 2] flow → RGB uint8 via the Middlebury colorwheel."""
    u = flow[..., 0].astype(np.float64).copy()
    v = flow[..., 1].astype(np.float64).copy()
    bad = ~(np.isfinite(u) & np.isfinite(v))
    u[bad] = 0
    v[bad] = 0
    rad = np.sqrt(u**2 + v**2)
    maxrad = max_flow if max_flow is not None else max(rad.max(), 1e-8)
    u = u / (maxrad + 1e-8)
    v = v / (maxrad + 1e-8)

    rad = np.sqrt(u**2 + v**2)
    a = np.arctan2(-v, -u) / np.pi
    ncols = _COLORWHEEL.shape[0]
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0

    img = np.zeros(flow.shape[:2] + (3,), np.uint8)
    for c in range(3):
        col0 = _COLORWHEEL[k0, c] / 255.0
        col1 = _COLORWHEEL[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] = col[~idx] * 0.75
        img[..., c] = np.floor(255 * col * ~bad).astype(np.uint8)
    return img


def visualize_optical_flow(flow: np.ndarray) -> np.ndarray:
    """HSV direction/magnitude colorization → BGR uint8
    (reference ``HREM.py:104-126`` / ``train_mvsec.py:153-176``)."""
    from matplotlib import colors

    flow = np.where(np.isinf(flow), 0, flow)
    hsv = np.zeros(flow.shape[:2] + (3,), float)
    mag = np.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2) ** 0.5
    ang = np.arctan2(flow[..., 1], flow[..., 0])
    ang[ang < 0] += 2 * np.pi
    hsv[..., 0] = ang / np.pi / 2.0
    hsv[..., 1] = 1
    rng = mag - mag.min()
    hsv[..., 2] = rng / max(rng.max(), 1e-8)
    rgb = colors.hsv_to_rgb(hsv)
    bgr = np.stack([rgb[..., 2], rgb[..., 1], rgb[..., 0]], axis=2)
    return (bgr * 255).astype(np.uint8)


def events_to_event_image(events: np.ndarray, height: int, width: int) -> np.ndarray:
    """[N, 4] (t, x, y, p) → BGR uint8 (pos=red, neg=blue on white)
    (reference ``utils/visualization.py:276`` semantics)."""
    img = np.full((height, width, 3), 255, np.uint8)
    x = events[:, 1].astype(int)
    y = events[:, 2].astype(int)
    p = events[:, 3]
    inb = (x >= 0) & (x < width) & (y >= 0) & (y < height)
    pos = inb & (p > 0)
    neg = inb & (p <= 0)
    img[y[pos], x[pos]] = (0, 0, 255)
    img[y[neg], x[neg]] = (255, 0, 0)
    return img
