"""Pooling ops (NHWC).

``avg_pool2d`` matches torch ``F.avg_pool2d(x, k, stride=k)`` (no padding,
floor division of output size) as used for the EEMFlow feature pyramids
(reference ``model/EEMFlow/EEMFlow.py:144-154``) and the CorrBlock pyramid
(reference ``model/corr.py:25-27``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def avg_pool2d(x: jax.Array, kernel_size, stride=None) -> jax.Array:
    """Average-pool an NHWC array. kernel_size/stride: int or (kh, kw)."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    if stride is None:
        stride = kernel_size
    if isinstance(stride, int):
        stride = (stride, stride)
    kh, kw = kernel_size
    sh, sw = stride
    B, H, W, C = x.shape
    if (kh, kw) == (sh, sw) and H % kh == 0 and W % kw == 0:
        # non-overlapping pool ≡ reshape + mean — avoids reduce-window,
        # whose TPU layout preferences insert relayout copies around the
        # EEMFlow pyramid pools (profiled; see docs/PERF.md)
        xr = x.reshape(B, H // kh, kh, W // kw, kw, C)
        return xr.mean(axis=(2, 4))
    # NOTE: the init value must be a Python literal — a traced scalar breaks
    # reverse-mode AD linearization under jit (JAX 0.9).
    summed = lax.reduce_window(
        x,
        0.0 if jnp.issubdtype(x.dtype, jnp.floating) else 0,
        lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding="VALID",
    )
    return summed / jnp.asarray(kh * kw, x.dtype)
