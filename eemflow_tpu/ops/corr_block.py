"""All-pairs 4D correlation volume + multi-scale windowed lookup.

The RAFT-lineage hot path (reference ``model/corr.py:12-60``):

  * ``build_corr_pyramid`` — all-pairs correlation ⟨f1(y,x), f2(Y,X)⟩ / √C via
    one big MXU matmul, viewed as a batch of (H2, W2) response maps (one per
    query pixel), then 4-level 2×2 average pooling.
  * ``lookup_corr_pyramid`` — per iteration, bilinearly sample a
    (2r+1)×(2r+1) window at ``coords / 2^level`` from each level and
    concatenate → [B, H, W, num_levels·(2r+1)²].

Channel-order parity quirk: the reference builds the window offsets as
``stack(meshgrid(dy, dx))`` but feeds component 0 to the sampler's *x* axis
(reference ``model/corr.py:37-43`` + ``model_utils.py:7-14``), so the flat
window index is ``(x_off+r)·(2r+1) + (y_off+r)`` — the x offset is the major
index.  We replicate exactly so ported weights see identical layouts.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from eemflow_tpu.ops.pooling import avg_pool2d
from eemflow_tpu.ops.warp import _gather_bilinear


def build_corr_pyramid(
    fmap1: jax.Array, fmap2: jax.Array, num_levels: int = 4
) -> List[jax.Array]:
    """fmap1, fmap2: [B, H, W, C] → list of [B*H*W, Hl, Wl, 1] volumes."""
    B, H, W, C = fmap1.shape
    f1 = fmap1.reshape(B, H * W, C)
    f2 = fmap2.reshape(B, H * W, C)
    # HIGHEST precision: the default matmul precision downcasts fp32 inputs
    # (bf16 passes on the MXU), which perturbs corr values by ~1e-2 — too
    # coarse for 0.01-EPE checkpoint parity.
    corr = jnp.einsum(
        "bnc,bmc->bnm",
        f1,
        f2,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / jnp.sqrt(jnp.asarray(C, jnp.float32))
    corr = corr.reshape(B * H * W, H, W, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        if corr.shape[1] >= 2 and corr.shape[2] >= 2:
            corr = avg_pool2d(corr, 2, 2)
        # else: feature map too coarse to pool further — repeat the last
        # level so the lookup channel count stays fixed (the reference
        # would produce a zero-sized map and crash here)
        pyramid.append(corr)
    return pyramid


def lookup_corr_pyramid(
    pyramid: List[jax.Array], coords: jax.Array, radius: int = 4
) -> jax.Array:
    """coords: [B, H, W, 2] (x, y) at level-0 resolution.

    Returns [B, H, W, num_levels*(2r+1)²], float32.
    """
    B, H, W, _ = coords.shape
    r = radius
    n = 2 * r + 1
    offs = jnp.arange(-r, r + 1, dtype=coords.dtype)

    cx = coords[..., 0].reshape(B * H * W)
    cy = coords[..., 1].reshape(B * H * W)

    out_levels = []
    for lvl, corr in enumerate(pyramid):
        scale = jnp.asarray(2.0**lvl, coords.dtype)
        # window index (i, j): x offset = offs[i] (major), y offset = offs[j]
        px = cx[:, None, None] / scale + offs[None, :, None]  # [N, n, 1]
        py = cy[:, None, None] / scale + offs[None, None, :]  # [N, 1, n]
        px = jnp.broadcast_to(px, (B * H * W, n, n))
        py = jnp.broadcast_to(py, (B * H * W, n, n))
        # degenerate-axis quirk of the reference's grid_sample roundtrip:
        # a size-1 level axis maps every coordinate to pixel 0 (see
        # ops.warp.bilinear_sampler docstring)
        if corr.shape[2] == 1:
            px = jnp.zeros_like(px)
        if corr.shape[1] == 1:
            py = jnp.zeros_like(py)
        sampled = _gather_bilinear(corr, px, py)  # [N, n, n, 1]
        out_levels.append(sampled.reshape(B, H, W, n * n))
    return jnp.concatenate(out_levels, axis=-1).astype(jnp.float32)
