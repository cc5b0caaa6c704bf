"""Pallas TPU kernel: windowed local correlation.

TPU-native replacement for the reference's CUDA extension
(``model/IRRPWC/correlation_package/correlation_cuda_kernel.cu`` and the pip
``spatial_correlation_sampler`` used by ``model/EEMFlow/EEMFlow.py:14-23``) —
semantics identical to ``ops.correlation.local_correlation``.

Design: streams x row-tiles via BlockSpec and DMAs the matching haloed y
rows from HBM into a VMEM scratch (overlapping windows are not pipelinable
as BlockSpecs), then computes all K displacement channels on-chip.
Channels are padded to the 128-lane tile (Mosaic requires lane-aligned
slice extents); zero lanes contribute zeros to the channel reduction.
Forward kernel with a custom VJP that routes gradients through the XLA
formulation.

MEASURED VERDICT (v5e-1, 184×320×32, K=53, fp32): this kernel runs at
2.63 ms; the plain XLA shift formulation (``ops.correlation
.local_correlation``) runs at 0.09 ms — XLA's fusion already tiles the
inputs into VMEM once and recomputes shifts on-chip, and is
bandwidth-bound at these shapes, while this kernel pays 4× lane-padding
traffic (C=32→128) and strided single-channel writes.  The XLA
formulation is therefore the production path; this kernel is kept as a
correct (1e-7-exact), tested reference for future shapes where fusion
breaks down (e.g. C≥128, very wide K).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eemflow_tpu.ops.correlation import local_correlation as _xla_local_correlation


def _kernel(x_ref, ypad_hbm, out_ref, y_scratch, sem, *, md: int, th: int,
            wanted: tuple, c_orig: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    k = 2 * md + 1

    # DMA the haloed y rows for this tile: rows [i*th, i*th + th + 2*md)
    dma = pltpu.make_async_copy(
        ypad_hbm.at[b, pl.ds(i * th, th + 2 * md)],
        y_scratch,
        sem,
    )
    dma.start()

    x = x_ref[0]  # [th, W, Cp]
    dma.wait()

    W = x.shape[1]
    inv_c = 1.0 / c_orig
    # write channels as they are produced — stacking all K first keeps K
    # full-size temporaries live and blows the VMEM budget
    for j, ch in enumerate(wanted):
        dy = ch // k
        dx = ch % k
        ysh = y_scratch[pl.ds(dy, th), pl.ds(dx, W), :]
        out_ref[0, :, :, j] = jnp.sum(x * ysh, axis=-1) * inv_c


def _forward(x, y, md, wanted, tile_h):
    B, H, W, C = x.shape
    K = len(wanted)
    # pad C to the 128-lane tile (zero lanes add zeros to the reduction),
    # H to a tile multiple, and y by the displacement halo.
    Cp = -(-C // 128) * 128
    Hp = -(-H // tile_h) * tile_h
    ypad = jnp.pad(y, ((0, 0), (md, md + (Hp - H)), (md, md), (0, Cp - C)))
    xp = jnp.pad(x, ((0, 0), (0, Hp - H), (0, 0), (0, Cp - C)))

    out = pl.pallas_call(
        functools.partial(
            _kernel, md=md, th=tile_h, wanted=tuple(wanted), c_orig=C
        ),
        grid=(B, Hp // tile_h),
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, W, Cp),
                lambda b, i: (b, i, 0, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, W, K),
            lambda b, i: (b, i, 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, K), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * md, W + 2 * md, Cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, ypad)
    return out[:, :H]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def local_correlation_pallas(
    x: jax.Array,
    y: jax.Array,
    max_displacement: int = 4,
    indices: Optional[Sequence[int]] = None,
    tile_h: int = 8,
) -> jax.Array:
    """Drop-in for ``ops.correlation.local_correlation`` on TPU."""
    k = 2 * max_displacement + 1
    wanted = tuple(range(k * k)) if indices is None else tuple(int(i) for i in indices)
    return _forward(x, y, max_displacement, wanted, tile_h)


def _fwd(x, y, max_displacement, indices, tile_h):
    out = local_correlation_pallas(x, y, max_displacement, indices, tile_h)
    return out, (x, y)


def _bwd(max_displacement, indices, tile_h, res, g):
    x, y = res
    # gradient via the XLA formulation (differentiable reference semantics)
    _, vjp = jax.vjp(
        lambda a, b: _xla_local_correlation(a, b, max_displacement, indices), x, y
    )
    return vjp(g)


local_correlation_pallas.defvjp(_fwd, _bwd)
