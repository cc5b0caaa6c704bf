"""Local (windowed) correlation — TPU-native replacement for the reference's
CUDA ``SpatialCorrelationSampler`` / ``correlation_package`` extension.

Semantics (reference ``model/EEMFlow/EEMFlow.py:14-23``):
``SpatialCorrelationSampler(1, 2*md+1, 1, 0, 1)(x, y).view(b,-1,h,w) / C``
computes, for displacement (dy, dx) ∈ [-md, md]²,

    out[b, (dy+md)*(2md+1) + (dx+md), y, x]
        = (1/C) * Σ_c x[b,c,y,x] · y[b,c,y+dy,x+dx]

with zero padding outside the frame.  The vertical displacement is the
*major* channel index (cross-checked against the pure-PyTorch twin in
reference ``model/IRRPWC/pwc_modules.py:43-64``).

TPU design: a static unrolled loop over displacements, each a fused
multiply + channel-reduction on the VPU — no im2col blow-up, XLA fuses each
shift.  ``indices`` restricts computation to the channels EEMFlow actually
consumes (its fixed 49/53-channel ``index_select``,
reference ``EEMFlow.py:85-94``), fusing the sparsification into the kernel.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def local_correlation(
    x: jax.Array,
    y: jax.Array,
    max_displacement: int = 4,
    indices: Optional[Sequence[int]] = None,
) -> jax.Array:
    """Windowed correlation of two NHWC feature maps.

    Returns [B, H, W, K] where K = (2*md+1)² (or len(indices)); channel
    ordering (dy-major) matches the CUDA sampler so reference-trained
    weights port directly.
    """
    B, H, W, C = x.shape
    md = max_displacement
    k = 2 * md + 1

    if indices is None:
        wanted = list(range(k * k))
    else:
        wanted = [int(i) for i in indices]

    ypad = jnp.pad(y, ((0, 0), (md, md), (md, md), (0, 0)))
    inv_c = jnp.asarray(1.0 / C, x.dtype)

    outs = []
    for ch in wanted:
        dy = ch // k - md
        dx = ch % k - md
        shifted = jax.lax.dynamic_slice(
            ypad, (0, md + dy, md + dx, 0), (B, H, W, C)
        )
        outs.append(jnp.sum(x * shifted, axis=-1) * inv_c)
    return jnp.stack(outs, axis=-1)
