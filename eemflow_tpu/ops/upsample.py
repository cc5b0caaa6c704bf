"""Bilinear resizing + flow upsampling (NHWC), exact torch numerics.

The reference mixes both torch ``align_corners`` conventions, so both are
implemented from scratch (separable gathers) rather than via
``jax.image.resize`` (whose downsampling anti-aliases and whose edge handling
differs):

  * align_corners=False — ``F.interpolate`` in reference
    ``model/EEMFlow/EEMFlow.py:119`` and ``loader/HREM.py:267``
    (src = (dst+0.5)·in/out − 0.5, clamped at 0).
  * align_corners=True — ``upflow8`` (reference ``model/model_utils.py:30-32``)
    and ``upsample2d_flow_as`` (reference ``model/EEMFlow/cdc_utils.py:80-103``)
    (src = dst·(in−1)/(out−1)).

``convex_upsample_flow`` is the RAFT mask-weighted 8× upsampler
(reference ``model/eraft.py:83-94``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _resize_axis(x: jax.Array, axis: int, out_size: int, align_corners: bool) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if align_corners:
        if out_size == 1:
            src = jnp.zeros((1,), jnp.float32)
        else:
            src = jnp.arange(out_size, dtype=jnp.float32) * (
                (in_size - 1) / (out_size - 1)
            )
    else:
        scale = in_size / out_size
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        src = jnp.maximum(src, 0.0)
    i0 = jnp.floor(src).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0.astype(jnp.float32)).astype(x.dtype)
    w0 = 1 - w1
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    return a * w0.reshape(shape) + b * w1.reshape(shape)


def resize_bilinear(x: jax.Array, size, align_corners: bool = False) -> jax.Array:
    """Resize NHWC array to (H, W) = size with torch bilinear numerics."""
    h, w = size
    x = _resize_axis(x, 1, h, align_corners)
    x = _resize_axis(x, 2, w, align_corners)
    return x


def upsample_flow_to(flow: jax.Array, size) -> jax.Array:
    """EEMFlow final upsampler: plain bilinear (align_corners=False), flow
    values NOT rescaled (reference ``EEMFlow.py:118-120``)."""
    return resize_bilinear(flow, size, align_corners=False)


def upflow8(flow: jax.Array) -> jax.Array:
    """8× bilinear (align_corners=True) and ×8 magnitudes."""
    B, H, W, C = flow.shape
    return 8.0 * resize_bilinear(flow, (8 * H, 8 * W), align_corners=True)


def upsample2d_flow_as(flow: jax.Array, target_hw, if_rate: bool = False) -> jax.Array:
    """Resize (align_corners=True) to target; optionally rescale u by W ratio
    and v by H ratio (reference ``cdc_utils.py:80-103``)."""
    h, w = target_hw
    _, h_, w_, _ = flow.shape
    res = resize_bilinear(flow, (h, w), align_corners=True)
    if if_rate:
        scale = jnp.asarray([w / w_, h / h_], res.dtype)
        res = res * scale
    return res


def convex_upsample_flow(flow: jax.Array, mask: jax.Array, factor: int = 8) -> jax.Array:
    """Convex-combination upsampling of flow by ``factor``.

    flow: [B, h, w, 2]; mask: [B, h, w, 9*factor²] with torch channel layout
    c = k·factor² + iy·factor + ix (k = 3×3 neighbor index, ky-major).
    Returns [B, h·factor, w·factor, 2] with flow magnitudes ×factor.
    """
    B, h, w, _ = flow.shape
    f = factor
    m = mask.reshape(B, h, w, 9, f, f)
    m = jax.nn.softmax(m, axis=3)

    fp = jnp.pad(factor * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 3x3 neighborhood, k = ky*3 + kx (torch unfold order)
    nb = jnp.stack(
        [fp[:, ky : ky + h, kx : kx + w, :] for ky in range(3) for kx in range(3)],
        axis=3,
    )  # [B, h, w, 9, 2]

    # HIGHEST precision: a 9-element contraction is cheap, and the default
    # matmul precision would downcast the convex weights (~1e-2 flow error).
    up = jnp.einsum(
        "bhwkyx,bhwkc->bhwyxc", m, nb, precision=jax.lax.Precision.HIGHEST
    )  # [B,h,w,f,f,2]
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(B, h * f, w * f, 2)
    return up
