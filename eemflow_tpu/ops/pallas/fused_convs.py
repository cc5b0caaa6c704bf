"""Fused stride-1 conv chain + average pool — the EEMFlow pyramid body.

EEMFlow's pyramid (reference ``model/EEMFlow/EEMFlow.py:75-82``) is three
levels of [stride-2 conv, then 1-2 stride-1 convs], each level average-
pooled to the coarse grid.  The stride-1 convs carry ~75% of the pyramid
FLOPs and run at tiny channel counts (16/32/64) where XLA's conv path is
dominated by activation relayouts (docs/PERF.md "Where EEMFlow's time
goes").  This kernel fuses a level's stride-1 convs and its pool into one
pass over row bands: HBM is read ~3× (neighbor-halo blocks) and written
once, all intermediates live in VMEM, the convs are im2col matmuls.

Semantics: each conv is 3×3, pad 1 (zeros), LeakyReLU(0.1), C→C.  Zero
padding is preserved exactly across the chain: the kernel computes on a
margin-padded plane and re-zeroes out-of-image rows/cols after every conv
(a conv's *input* is zero outside the image — NOT the previous conv
evaluated beyond the boundary, which would leak bias+relu).

``compute_dtype=bfloat16`` casts the matmul operands (fp32 accumulation)
— the serving configuration, ~1e-3 rel feature perturbation, model-level
tolerance tested.  fp32 operands give parity to fp noise.

Grid: (B, H/tile_rows); tile_rows = the pool window so each program emits
one pooled row band.  The three input views are the (i-1, i, i+1) row
blocks (clamped at the ends; out-of-image halo rows are masked to zero
in-kernel), giving the conv halo without overlapping BlockSpecs.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_conv3x3(kernel: jax.Array) -> jax.Array:
    """(3,3,Cin,Cout) HWIO → (9·Cin, Cout), tap-major (matches im2col)."""
    kh, kw, cin, cout = kernel.shape
    return kernel.reshape(kh * kw * cin, cout)


def _lrelu(x):
    return jnp.where(x > 0, x, 0.1 * x)


def _kernel(
    n_convs: int,
    tile_rows: int,
    H: int,
    W: int,
    pool,
    pool_group: int,
    emit_full: bool,
    compute_dtype,
    variant: str,
    relus: Tuple[bool, ...],
    concat: Tuple[bool, ...],
    *refs,
):
    prev_ref, cur_ref, next_ref = refs[0], refs[1], refs[2]
    w_refs = refs[3 : 3 + n_convs]
    b_refs = refs[3 + n_convs : 3 + 2 * n_convs]
    out_refs = refs[3 + 2 * n_convs :]

    i = pl.program_id(1)
    h = n_convs  # rows of halo needed on each side
    m = n_convs  # zero-margin columns on each side

    band = jnp.concatenate(
        [prev_ref[0, -h:], cur_ref[0], next_ref[0, :h]], axis=0
    ).astype(jnp.float32)
    # (tile_rows + 2h, W, C); image row of band row r = i*tile_rows - h + r.
    # The edge tiles' clamped neighbor blocks hold duplicated in-image data
    # where the conv needs zero padding — mask out-of-image rows to zero.
    # full-rank iota (not 2D + [:, :, None]): Mosaic rejects minor-dim
    # insertion on the i1 mask ("only supported for 32-bit types")
    rows0 = (
        jax.lax.broadcasted_iota(jnp.int32, band.shape, 0)
        + i * tile_rows
        - h
    )
    band = jnp.where((rows0 >= 0) & (rows0 < H), band, 0.0)

    plane = jnp.pad(band, ((0, 0), (m, m), (0, 0)))

    for j in range(n_convs):
        R, Wp, C = plane.shape
        w = w_refs[j][:]
        if variant == "im2col":
            cols = [
                jax.lax.slice(
                    plane, (dy, dx, 0), (R - 2 + dy, Wp - 2 + dx, C)
                )
                for dy in range(3)
                for dx in range(3)
            ]
            x9 = jnp.concatenate(cols, axis=-1).reshape(
                (R - 2) * (Wp - 2), 9 * C
            )
            y = jnp.dot(
                x9.astype(compute_dtype),
                w.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            ) + b_refs[j][:]
        else:  # "taps": 9 accumulated dots, no X9 materialisation
            y = b_refs[j][:] * jnp.ones(
                ((R - 2) * (Wp - 2), 1), jnp.float32
            )
            for t, (dy, dx) in enumerate(
                (a, b) for a in range(3) for b in range(3)
            ):
                xt = jax.lax.slice(
                    plane, (dy, dx, 0), (R - 2 + dy, Wp - 2 + dx, C)
                ).reshape((R - 2) * (Wp - 2), C)
                y = y + jnp.dot(
                    xt.astype(compute_dtype),
                    w[t * C : (t + 1) * C].astype(compute_dtype),
                    preferred_element_type=jnp.float32,
                )
        if relus[j]:
            y = _lrelu(y)
        y = y.reshape(R - 2, Wp - 2, w.shape[1])
        # restore exact zero-pad semantics for the next conv: zero the
        # margin cols and any out-of-image rows this conv just filled
        mm = m - 1 - j
        row0 = i * tile_rows - h + (j + 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0) + row0
        keep = (rows >= 0) & (rows < H)
        if mm > 0:
            colix = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
            keep = keep & (colix >= mm) & (colix < Wp - 2 - mm)
        y = jnp.where(keep, y, 0.0)
        if concat[j]:
            # densely-connected chain (reference FlowEstimatorDense):
            # next conv consumes [y, previous buffer].  The carried
            # center slice is already zero outside the image (initial
            # jnp.pad margins + this same mask on earlier convs), so the
            # concat stays consistent with zero-pad semantics.
            carry = jax.lax.slice(plane, (1, 1, 0), (R - 1, Wp - 1, C))
            plane = jnp.concatenate([y, carry], axis=-1)
        else:
            plane = y

    # plane is now exactly rows [i*tile_rows, (i+1)*tile_rows) × W × C
    if emit_full:
        out_refs[0][0] = plane.astype(out_refs[0].dtype)
    if pool is not None and pool_group == 1:
        pooled = plane.reshape(
            tile_rows // pool, pool, W // pool, pool, plane.shape[-1]
        ).mean(axis=(1, 3))
        out_refs[-1][0] = pooled.astype(out_refs[-1].dtype)
    elif pool is not None:
        # tile_rows < pool: one pooled row spans pool_group consecutive
        # programs.  The pooled output block's index map is constant across
        # the group, so the block stays VMEM-resident (output revisiting)
        # and partial sums accumulate into it; the first program of each
        # group initialises it.
        partial = (
            plane.reshape(tile_rows, W // pool, pool, plane.shape[-1])
            .sum(axis=(0, 2))
            * (1.0 / (pool * pool))
        )[None].astype(out_refs[-1].dtype)

        @pl.when(i % pool_group == 0)
        def _init():
            out_refs[-1][0] = partial

        @pl.when(i % pool_group != 0)
        def _acc():
            out_refs[-1][0] += partial


def fused_convs_pool(
    x: jax.Array,
    kernels: Sequence[jax.Array],
    biases: Sequence[jax.Array],
    pool: int | None,
    tile_rows: int | None = None,
    compute_dtype=jnp.float32,
    emit_full: bool = True,
    variant: str = "im2col",
    relus: Sequence[bool] | None = None,
    concat: Sequence[bool] | None = None,
    interpret: bool = False,
) -> Tuple[jax.Array | None, jax.Array | None]:
    """Run a chain of 3×3 pad-1 convs (LeakyReLU 0.1 per `relus`, default
    all) then optionally avg-pool the result.

    x: (B, H, W, C).  kernels: HWIO (3,3,Cin_i,Cout_i), chained
    (Cin_{i+1} == Cout_i; Cin_0 == C).  Returns (full-res output or
    None, pooled (B, H/pool, W/pool, Cout) or None), fp32.

    ``concat[i]=True`` makes conv i densely connected: the next conv's
    input is [out_i, in_i] (reference ``cdc_utils.py:109-145``
    FlowEstimatorDense), so Cin_{i+1} = Cout_i + Cin_i.

    For wide rows or deep chains prefer ``variant="taps"`` — the im2col
    matrix (rows·cols × 9·Cin) can exceed VMEM where the 9 accumulated
    tap dots cannot.
    """
    B, H, W, C = x.shape
    n = len(kernels)
    concat = tuple(concat) if concat is not None else (False,) * n
    assert len(concat) == n
    chain = [C]
    for i, k in enumerate(kernels):
        chain.append(k.shape[3] + (chain[i] if concat[i] else 0))
    assert n >= 1 and all(
        k.shape[:3] == (3, 3, chain[i]) for i, k in enumerate(kernels)
    ), [k.shape for k in kernels]
    c_out = chain[-1]
    relus = tuple(relus) if relus is not None else (True,) * n
    assert len(relus) == n
    assert emit_full or pool is not None
    tr = tile_rows or pool or 8

    # VMEM guard: Mosaic pads the lane (minor = channel) dim to 128, so at
    # small C the row-band working set is up to 8× its logical size — full
    # pool-window tiles at e.g. 384×640×16 blow the 16 MB scoped-vmem stack
    # limit (measured on v5e).  Shrink the row tile until the padded
    # working-set estimate fits; pooled outputs are then accumulated across
    # programs via output-block revisiting (pool_group below).  The live
    # row-band buffer count scales with chain depth: measured ~7 per conv
    # (n=1: 80.0 MB at 36 padded rows × 0.332 MB/row ⇒ 6.7; n=2: 18.87 MB
    # at 8 rows × 0.168 ⇒ 14.0 — v5e Mosaic stack reports).
    max_c = max(chain)
    lanes = -(-max_c // 128) * 128
    sub = -(-(W + 2 * n) // 8) * 8

    def _est(r):
        return 7 * n * (r + 2 * n) * sub * lanes * 4

    budget = 14 << 20
    while _est(tr) > budget:
        cand = tr // 2
        while cand > max(n, 1) and ((pool or H) % cand or H % cand):
            cand -= 1
        if cand < max(n, 1) or cand >= tr:
            break  # smallest legal tile
        tr = cand

    if _est(tr) > budget and n > 1:
        # even the smallest legal row tile exceeds scoped VMEM (halo and
        # live buffers grow with chain depth) — split the chain into two
        # kernels; the intermediate full-res plane round-trips HBM once
        s = n // 2
        mid, _ = fused_convs_pool(
            x, kernels[:s], biases[:s], pool=None, tile_rows=tr,
            compute_dtype=compute_dtype, emit_full=True, variant=variant,
            relus=relus[:s], concat=concat[:s], interpret=interpret,
        )
        return fused_convs_pool(
            mid, kernels[s:], biases[s:], pool=pool,
            tile_rows=tile_rows or tr, compute_dtype=compute_dtype,
            emit_full=emit_full, variant=variant, relus=relus[s:],
            concat=concat[s:], interpret=interpret,
        )

    if pool is not None and tr < pool:
        assert pool % tr == 0 and H % pool == 0, (pool, tr, H)
        pool_group = pool // tr
    else:
        pool_group = 1
    assert H % tr == 0 and (
        pool is None or ((pool_group > 1 or tr % pool == 0) and W % pool == 0)
    )
    assert tr >= n, (tr, n)  # neighbor blocks must cover the conv halo
    T = H // tr

    ws = [pack_conv3x3(jnp.asarray(k, jnp.float32)) for k in kernels]
    bs = [
        jnp.asarray(b, jnp.float32).reshape(1, -1) for b in biases
    ]

    in_specs = [
        pl.BlockSpec(
            (1, tr, W, C),
            functools.partial(
                lambda b, i, d: (b, jnp.clip(i + d, 0, T - 1), 0, 0), d=d
            ),
            memory_space=pltpu.VMEM,
        )
        for d in (-1, 0, 1)
    ]
    for t in ws + bs:
        in_specs.append(
            pl.BlockSpec(t.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM)
        )

    out_specs = []
    out_shapes = []
    if emit_full:
        out_specs.append(
            pl.BlockSpec(
                (1, tr, W, c_out), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(jax.ShapeDtypeStruct((B, H, W, c_out), jnp.float32))
    if pool is not None:
        if pool_group == 1:
            out_specs.append(
                pl.BlockSpec(
                    (1, tr // pool, W // pool, c_out),
                    lambda b, i: (b, i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        else:
            # one pooled-row block revisited by pool_group consecutive
            # programs (index map constant within a group)
            out_specs.append(
                pl.BlockSpec(
                    (1, 1, W // pool, c_out),
                    functools.partial(
                        lambda b, i, g: (b, i // g, 0, 0), g=pool_group
                    ),
                    memory_space=pltpu.VMEM,
                )
            )
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (B, H // pool, W // pool, c_out), jnp.float32
            )
        )

    res = pl.pallas_call(
        functools.partial(_kernel, n, tr, H, W, pool, pool_group,
                          emit_full, compute_dtype, variant, relus, concat),
        grid=(B, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        # CPU backend has no Mosaic path — interpret keeps the fast modes
        # functional (slow) there, so --fast CLIs work off-TPU
        interpret=interpret or jax.default_backend() == "cpu",
        # Mosaic's 16 MB scoped-VMEM default is marginally exceeded at the
        # EEMFlow+ 720p decoder shapes (16.87 MB — round-4 diagnosis); the
        # v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
    )(x, x, x, *ws, *bs)
    full = res[0] if emit_full else None
    pooled = res[-1] if pool is not None else None
    return full, pooled
