"""Bilinear sampling and backwarping (NHWC).

Replicates torch ``F.grid_sample`` numerics exactly, for both
``align_corners`` conventions, since the reference mixes them:

  * ``bilinear_sampler`` — reference ``model/model_utils.py:7-21``:
    pixel-coordinate sampling with ``align_corners=True`` + zero padding
    (used by the CorrBlock lookup and KPA/GMA variants).
  * ``backwarp`` — reference ``utils_luo/tools.py:2262-2307`` ``torch_warp``:
    grid+flow, normalized with ``2x/(W-1)-1`` but sampled with torch's
    *default* ``align_corners=False`` → effective pixel coordinate
    ``x·W/(W-1) − 0.5``.  Used by the SGU/cdc upsampler.
  * ``backwarp_masked`` — reference ``model/EEMFlow/cdc_utils.py:50-78``
    ``WarpingLayer_no_div``: same as backwarp plus an in-bounds mask built by
    warping a ones tensor and thresholding at 1.0.
  * ``warp_align_corners`` — reference ``model/EEMFlow/EEMFlow+.py:137-149``:
    grid+flow with ``align_corners=True`` (exact pixel coords).

All functions are jit-safe, static-shape, and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_bilinear(img: jax.Array, px: jax.Array, py: jax.Array) -> jax.Array:
    """Bilinear sample NHWC ``img`` at per-batch pixel coords with zero padding.

    img: [B, H, W, C]; px, py: [B, h, w] float pixel coordinates.
    Out-of-bounds neighbors contribute zero (torch ``padding_mode='zeros'``).
    Returns [B, h, w, C].
    """
    B, H, W, C = img.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = px - x0
    wx0 = 1.0 - wx1
    wy1 = py - y0
    wy0 = 1.0 - wy1

    def take(ix, iy):
        inb = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        # gather per batch: img[b, iyc[b], ixc[b], :]
        vals = jax.vmap(lambda im, yy, xx: im[yy, xx])(img, iyc, ixc)
        return vals * inb[..., None].astype(img.dtype)

    out = (
        take(x0, y0) * (wx0 * wy0)[..., None]
        + take(x1, y0) * (wx1 * wy0)[..., None]
        + take(x0, y1) * (wx0 * wy1)[..., None]
        + take(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out


def grid_sample_pixel(img: jax.Array, px: jax.Array, py: jax.Array,
                      align_corners: bool = True) -> jax.Array:
    """Sample NHWC image at pixel coordinates given in the *align_corners=True*
    convention; when ``align_corners=False`` apply torch's coordinate remap of
    the ``2x/(W-1)-1`` normalization used throughout the reference."""
    B, H, W, C = img.shape
    if not align_corners:
        px = px * (W / max(W - 1, 1)) - 0.5
        py = py * (H / max(H - 1, 1)) - 0.5
    return _gather_bilinear(img, px, py)


def bilinear_sampler(img: jax.Array, coords: jax.Array, mask: bool = False):
    """RAFT-style sampler. img: [B,H,W,C]; coords: [B,h,w,2] (x, y) pixel
    coords, align_corners=True, zero padding.

    Degenerate-axis quirk (replicated from the reference's normalize →
    grid_sample roundtrip, ``model_utils.py:10-15``): on a size-1 axis,
    ``2x/max(W-1,1) - 1`` unnormalizes every coordinate to pixel 0 — all
    samples read the single pixel instead of being out of bounds."""
    px = coords[..., 0]
    py = coords[..., 1]
    if img.shape[2] == 1:
        px = jnp.zeros_like(px)
    if img.shape[1] == 1:
        py = jnp.zeros_like(py)
    out = _gather_bilinear(img, px, py)
    if mask:
        B, H, W, _ = img.shape
        xg = 2.0 * px / max(W - 1, 1) - 1.0
        yg = 2.0 * py / max(H - 1, 1) - 1.0
        m = (xg > -1) & (yg > -1) & (xg < 1) & (yg < 1)
        return out, m.astype(img.dtype)
    return out


def _base_grid(B: int, H: int, W: int, dtype) -> tuple[jax.Array, jax.Array]:
    xs = jnp.arange(W, dtype=dtype)
    ys = jnp.arange(H, dtype=dtype)
    gx = jnp.broadcast_to(xs[None, None, :], (B, H, W))
    gy = jnp.broadcast_to(ys[None, :, None], (B, H, W))
    return gx, gy


def backwarp(x: jax.Array, flow: jax.Array) -> jax.Array:
    """torch_warp equivalent: warp im2 back to im1 by flow.

    x: [B,H,W,C]; flow: [B,H,W,2] (dx, dy). align_corners=False numerics."""
    B, H, W, C = x.shape
    gx, gy = _base_grid(B, H, W, flow.dtype)
    return grid_sample_pixel(x, gx + flow[..., 0], gy + flow[..., 1],
                             align_corners=False)


def backwarp_border(x: jax.Array, flow: jax.Array) -> jax.Array:
    """Backwarp with border padding, align_corners=False (the STE-FlowNet
    ``flow_warp``, reference ``STEmodel/STEFlow.py:324-347``): grid_sample's
    border mode equals clamping the remapped sample coordinates into
    [0, size-1] before the bilinear gather."""
    B, H, W, C = x.shape
    gx, gy = _base_grid(B, H, W, flow.dtype)
    px = (gx + flow[..., 0]) * (W / max(W - 1, 1)) - 0.5
    py = (gy + flow[..., 1]) * (H / max(H - 1, 1)) - 0.5
    px = jnp.clip(px, 0.0, W - 1)
    py = jnp.clip(py, 0.0, H - 1)
    return _gather_bilinear(x, px, py)


def backwarp_masked(x: jax.Array, flow: jax.Array) -> jax.Array:
    """WarpingLayer_no_div equivalent: backwarp then zero pixels whose
    warped ones-mask is < 1 (partially/fully out of bounds).

    The in-bounds mask is computed analytically — a sample's warped-ones
    bilinear sum is exactly 1 iff the (align_corners=False remapped) position
    lies fully inside [0, W-1]×[0, H-1]; thresholding the float sum (as the
    reference does) is fp-borderline on exact-boundary samples."""
    B, H, W, C = x.shape
    gx, gy = _base_grid(B, H, W, flow.dtype)
    px = gx + flow[..., 0]
    py = gy + flow[..., 1]
    out = grid_sample_pixel(x, px, py, align_corners=False)
    ex = px * (W / max(W - 1, 1)) - 0.5
    ey = py * (H / max(H - 1, 1)) - 0.5
    inb = (ex >= 0) & (ex <= W - 1) & (ey >= 0) & (ey <= H - 1)
    return out * inb[..., None].astype(x.dtype)


def warp_align_corners(x: jax.Array, flow: jax.Array) -> jax.Array:
    """EEMFlow+ ``warp``: backwarp with align_corners=True (exact pixel)."""
    B, H, W, C = x.shape
    gx, gy = _base_grid(B, H, W, flow.dtype)
    return grid_sample_pixel(x, gx + flow[..., 0], gy + flow[..., 1],
                             align_corners=True)


def forward_interpolate(flow: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Forward-splat a flow field to its target positions — the RAFT
    warm-start primitive (reference ``utils/image_utils.py:53``
    ``forward_interpolate_pytorch`` via ``grid_sample_values:11``; the
    scipy-griddata twin lives in every family's utils, e.g.
    ``model/GMA/utils/utils.py:28`` and
    ``model/SDCEImodel/sample_utils.py:7``).

    Each source pixel deposits its flow value at ``(x+dx, y+dy)`` with
    bilinear weights over the four surrounding integer pixels; deposits are
    accumulated and weight-normalized.  Torch's loop of four ``put_``
    calls becomes four XLA scatter-adds (the voxelizer's formulation), so
    the op is jit-able and differentiable.

    Args:  flow [B,H,W,2] (NHWC).
    Returns: (flow_new [B,H,W,2], valid [B,H,W] bool — True where at least
    one splat landed; invalid pixels are 0, matching the reference).
    """
    B, H, W, _ = flow.shape
    gx, gy = _base_grid(B, H, W, flow.dtype)
    dx, dy = flow[..., 0], flow[..., 1]
    x1 = (gx + dx).reshape(B, -1)
    y1 = (gy + dy).reshape(B, -1)
    vals = jnp.stack([dx.reshape(B, -1), dy.reshape(B, -1)], -1)  # [B,N,2]

    def splat_one(x, y, v):
        acc = jnp.zeros((H * W, 3), v.dtype)  # [:,0:2] values, [:,2] weight
        ones = jnp.ones_like(x)
        for xi in (jnp.floor(x), jnp.ceil(x)):
            for yi in (jnp.floor(y), jnp.ceil(y)):
                w = (1.0 - jnp.abs(x - xi)) * (1.0 - jnp.abs(y - yi))
                inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
                idx = jnp.where(inb, (xi + W * yi).astype(jnp.int32), H * W)
                upd = jnp.concatenate(
                    [v * w[:, None], (w * ones)[:, None]], -1
                )
                acc = acc.at[idx].add(upd, mode="drop")
        valid = acc[:, 2] > 0
        out = acc[:, :2] / (acc[:, 2:3] + 1e-15)
        return out, valid

    out, valid = jax.vmap(splat_one)(x1, y1, vals)
    return out.reshape(B, H, W, 2), valid.reshape(B, H, W)
