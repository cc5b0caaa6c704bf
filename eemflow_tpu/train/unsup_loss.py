"""Unsupervised-flow loss library (reference ``utils_luo/tools.py:2948-3240``
``Loss_tools``: weighted SSIM, edge-aware smoothness, photometric losses,
census transform loss).  Not used by the supervised entry points (same as
the reference) but part of the framework surface for unsupervised training.

All NHWC, jit-safe, differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eemflow_tpu.ops.pooling import avg_pool2d


def _avg3(x):
    """3×3 mean with valid padding."""
    return avg_pool2d(x, 3, 1)


def weighted_ssim(x, y, weight, c1=0.01**2, c2=0.03**2, weight_epsilon=0.01):
    """SSIM-based distance map weighted by a per-pixel mask
    (reference ``tools.py:2951-3007`` semantics).

    x, y: [B,H,W,C]; weight: [B,H,W,1].  Returns ([B,H-2,W-2,C], avg_weight).
    """
    w = _avg3(weight)
    inv_w = 1.0 / (w + weight_epsilon)

    def wavg(z):
        return _avg3(z * weight) * inv_w

    mu_x = wavg(x)
    mu_y = wavg(y)
    sigma_x = wavg(x**2) - mu_x**2
    sigma_y = wavg(y**2) - mu_y**2
    sigma_xy = wavg(x * y) - mu_x * mu_y
    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    result = jnp.clip(ssim_n / ssim_d, 0.0, 1.0)
    return (1.0 - result) / 2.0, w


def _grad_x(img):
    return img[:, :, :-1, :] - img[:, :, 1:, :]


def _grad_y(img):
    return img[:, :-1, :, :] - img[:, 1:, :, :]


def edge_aware_smoothness_1st(image, flow, alpha: float = 10.0):
    """First-order edge-aware smoothness (reference ``tools.py:3009-3048``)."""
    img_gx = jnp.mean(jnp.abs(_grad_x(image)), axis=-1, keepdims=True)
    img_gy = jnp.mean(jnp.abs(_grad_y(image)), axis=-1, keepdims=True)
    wx = jnp.exp(-alpha * img_gx)
    wy = jnp.exp(-alpha * img_gy)
    sx = jnp.abs(_grad_x(flow)) * wx
    sy = jnp.abs(_grad_y(flow)) * wy
    return jnp.mean(sx) / 2.0 + jnp.mean(sy) / 2.0


def edge_aware_smoothness_2nd(image, flow, alpha: float = 10.0):
    """Second-order variant (reference ``tools.py:3050-3090``)."""
    img_gx = jnp.mean(jnp.abs(_grad_x(image)), axis=-1, keepdims=True)[:, :, 1:, :]
    img_gy = jnp.mean(jnp.abs(_grad_y(image)), axis=-1, keepdims=True)[:, 1:, :, :]
    wx = jnp.exp(-alpha * img_gx)
    wy = jnp.exp(-alpha * img_gy)
    fxx = _grad_x(_grad_x(flow))
    fyy = _grad_y(_grad_y(flow))
    return jnp.mean(jnp.abs(fxx) * wx) / 2.0 + jnp.mean(jnp.abs(fyy) * wy) / 2.0


def photo_loss(im_diff, mask, loss_type: str = "abs_robust", q: float = 0.4,
               eps: float = 0.01):
    """Photometric penalties (reference ``photo_loss_multi_type``,
    ``tools.py:3113-3170``): 'abs_robust' (|d|+eps)^q or 'charbonnier'."""
    if loss_type == "abs_robust":
        p = jnp.power(jnp.abs(im_diff) + 0.01, q)
    elif loss_type == "charbonnier":
        p = jnp.power(jnp.sum(im_diff**2, axis=-1, keepdims=True) + eps**2, 0.45)
    else:
        raise ValueError(loss_type)
    return jnp.sum(p * mask) / (jnp.sum(mask) + 1e-6)


def census_transform(img, patch_size: int = 7):
    """Soft census descriptor: per-pixel normalized differences against the
    surrounding patch (reference ``tools.py:3172-3240`` semantics)."""
    intensity = jnp.mean(img, axis=-1, keepdims=True) * 255.0
    B, H, W, _ = intensity.shape
    r = patch_size // 2
    pad = jnp.pad(intensity, ((0, 0), (r, r), (r, r), (0, 0)))
    neighbors = jnp.concatenate(
        [
            pad[:, dy : dy + H, dx : dx + W, :]
            for dy in range(patch_size)
            for dx in range(patch_size)
        ],
        axis=-1,
    )
    diff = neighbors - intensity
    return diff / jnp.sqrt(0.81 + diff**2)


def census_loss(img1, img2_warp, mask, patch_size: int = 7, q: float = 0.4):
    """Ternary census loss between img1 and the warped img2."""
    t1 = census_transform(img1, patch_size)
    t2 = census_transform(img2_warp, patch_size)
    dist = (t1 - t2) ** 2
    dist_norm = dist / (0.1 + dist)
    dist_sum = jnp.sum(dist_norm, axis=-1, keepdims=True)
    # zero out the border where the census window is invalid
    r = patch_size // 2
    B, H, W, _ = mask.shape
    inner = jnp.zeros((H, W), mask.dtype).at[r : H - r, r : W - r].set(1.0)
    m = mask * inner[None, :, :, None]
    return photo_loss(dist_sum, m, "abs_robust", q=q)
