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


def build_corr_pyramid(
    fmap1: jax.Array, fmap2: jax.Array, num_levels: int = 4,
    fast: bool = False,
) -> List[jax.Array]:
    """fmap1, fmap2: [B, H, W, C] → list of [B*H*W, Hl, Wl, 1] volumes.

    FUSED pyramid pooling: the reference builds the full [N, H, W] volume
    and average-pools it per level (``model/corr.py:52-60``) — rereading
    the largest tensor in the model three times.  Correlation is linear in
    f2, so pooling the *response maps* over (Y, X) equals correlating
    against the pooled *feature map*: each level is its own all-pairs
    matmul ``f1 · avg_pool^l(f2)ᵀ`` (Σ 1+¼+…  ≈ 1.33× the level-0 FLOPs,
    all MXU) and the pooling pass over the N·H·W volume disappears.

    ``fast=False`` (parity mode): fp32 operands, HIGHEST precision — the
    default matmul precision downcasts fp32 (~1e-2 corr perturbation),
    too coarse for 0.01-EPE checkpoint parity.
    ``fast=True`` (serving mode): bf16 operands with fp32 MXU
    accumulation — one MXU pass instead of HIGHEST's six — and the
    volumes are STORED bf16, which halves the lookup's HBM traffic (the
    RAFT loop's dominant bandwidth; ``lookup_corr_pyramid`` switches to
    its bf16 path on the volume dtype).
    """
    B, H, W, C = fmap1.shape
    dtype = jnp.bfloat16 if fast else jnp.float32
    prec = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    f1 = fmap1.reshape(B, H * W, C).astype(dtype)
    inv_sqrt_c = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))

    pyramid: List[jax.Array] = []
    f2l = fmap2.astype(jnp.float32)
    for _ in range(num_levels):
        Hl, Wl = f2l.shape[1:3]
        corr = jnp.einsum(
            "bnc,bmc->bnm",
            f1,
            f2l.reshape(B, Hl * Wl, C).astype(dtype),
            preferred_element_type=jnp.float32,
            precision=prec,
        ) * inv_sqrt_c
        # fast: scale in fp32 (fused into the matmul epilogue), store bf16
        pyramid.append(corr.astype(dtype).reshape(B * H * W, Hl, Wl, 1))
        if Hl >= 2 and Wl >= 2:
            # fp32 pooling regardless of mode: repeated 2×2 means in bf16
            # would compound rounding across levels
            f2l = avg_pool2d(f2l, 2, 2)
        # else: feature map too coarse to pool further — the next level
        # repeats this one so the lookup channel count stays fixed (the
        # reference would produce a zero-sized map and crash here)
    return pyramid


def _tap_matrix(pos: jax.Array, offs: jax.Array, size: int) -> jax.Array:
    """Bilinear tap weights as a dense matrix: [N, n_taps, size].

    Row (q, t) holds the two bilinear weights of sample position
    ``pos[q] + offs[t]`` at integer cells 0..size-1; taps outside the axis
    get no matching cell → zero row (exactly torch's zero padding, which
    factors per-axis for a separable window)."""
    p = pos[:, None] + offs[None, :]  # [N, n]
    i0 = jnp.floor(p)
    f = p - i0
    ids = jnp.arange(size, dtype=p.dtype)  # [size]
    a0 = (ids[None, None, :] == i0[..., None]).astype(p.dtype) * (1.0 - f)[..., None]
    a1 = (ids[None, None, :] == (i0 + 1.0)[..., None]).astype(p.dtype) * f[..., None]
    return a0 + a1


# (A shift-based tap build — one base one-hot pair + 2r+1 static slices,
# ~9× fewer comparisons — was measured 1.8× SLOWER in-model: the
# slice+stack pattern breaks XLA's tap-build/contraction fusion.
# docs/PERF.md round 4; keep the direct iota build below.)


def lookup_corr_pyramid_stacked(
    pyramid: List[jax.Array], coords: jax.Array, radius: int = 4
) -> jax.Array:
    """Same result as :func:`lookup_corr_pyramid`, computed as ONE batched
    einsum pair over all levels instead of one pair per level.

    Round-2 profiling found per-level lookup cost FLAT across 16× level
    sizes (docs/PERF.md) — fixed per-einsum overhead inside the scan, not
    bandwidth — so the levels are zero-padded to the level-0 extent and
    stacked ([N, L, H0, W0]); the padded cells meet zero tap weights, so
    the contraction is exact (extra fp32 zero addends).  The pad/stack
    runs once per CALL, so callers should hoist it if the pyramid is
    reused — see the precomputed-stack variant in ``models.eraft``.
    """
    stack, shapes = build_corr_stack(pyramid)
    return lookup_corr_stack(stack, shapes, coords, radius)


def build_corr_stack(pyramid: List[jax.Array]):
    """Zero-pad every pyramid level to the level-0 extent and stack:
    → ([N, L, H0, W0], [(H_i, W_i)]).  Hoist this when the pyramid is
    reused across iterations (``models.eraft.raft_refine``)."""
    H0, W0 = pyramid[0].shape[1:3]
    stack = jnp.stack(
        [
            jnp.pad(
                c[..., 0],
                ((0, 0), (0, H0 - c.shape[1]), (0, W0 - c.shape[2])),
            )
            for c in pyramid
        ],
        axis=1,
    )  # [N, L, H0, W0]
    return stack, [c.shape[1:3] for c in pyramid]


def lookup_corr_stack(
    stack: jax.Array, level_shapes, coords: jax.Array, radius: int = 4
) -> jax.Array:
    """Windowed lookup over a zero-padded level stack [N, L, H0, W0].

    ``level_shapes``: the true (Hl, Wl) per level (static).  Tap matrices
    are built per level at its true extent, zero-padded to (H0, W0) —
    padded corr cells only ever meet zero weights, so the batched
    contraction equals the per-level form exactly.
    """
    B, H, W, _ = coords.shape
    r = radius
    n = 2 * r + 1
    L = stack.shape[1]
    H0, W0 = stack.shape[2:4]
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)

    N = B * H * W
    cx = coords[..., 0].reshape(N).astype(jnp.float32)
    cy = coords[..., 1].reshape(N).astype(jnp.float32)

    axs, ays = [], []
    for lvl, (Hl, Wl) in enumerate(level_shapes):
        inv_scale = jnp.float32(0.5**lvl)
        if Wl == 1:
            ax = _tap_matrix(jnp.zeros_like(cx), jnp.zeros_like(offs), Wl)
        else:
            ax = _tap_matrix(cx * inv_scale, offs, Wl)
        if Hl == 1:
            ay = _tap_matrix(jnp.zeros_like(cy), jnp.zeros_like(offs), Hl)
        else:
            ay = _tap_matrix(cy * inv_scale, offs, Hl)
        axs.append(jnp.pad(ax, ((0, 0), (0, 0), (0, W0 - Wl))))
        ays.append(jnp.pad(ay, ((0, 0), (0, 0), (0, H0 - Hl))))
    ax = jnp.stack(axs, axis=1)  # [N, L, n, W0]
    ay = jnp.stack(ays, axis=1)  # [N, L, n, H0]

    c = stack.astype(jnp.float32)
    # qliy intermediate for the same minor-dim reason as
    # lookup_corr_pyramid (docs/PERF.md round 4)
    tmp = jnp.einsum(
        "qlyx,qlix->qliy", c, ax,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [N, L, n, H0]
    win = jnp.einsum(
        "qliy,qljy->qlij", tmp, ay,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [N, L, n(x-major), n(y)]
    return win.reshape(B, H, W, L * n * n)


def lookup_corr_pyramid(
    pyramid: List[jax.Array], coords: jax.Array, radius: int = 4
) -> jax.Array:
    """coords: [B, H, W, 2] (x, y) at level-0 resolution.

    Returns [B, H, W, num_levels*(2r+1)²], float32.

    TPU formulation: the (2r+1)² window positions are the outer product of
    2r+1 x-taps and 2r+1 y-taps, and bilinear-with-zero-padding weights
    factor per axis — so each level's lookup is TWO batched matmuls
    (``A_y · corr · A_xᵀ``) on the MXU instead of per-point gathers.
    Measured on the v5e at ERAFT's 512×960 point: ~130 ms/lookup (gather)
    → matmul form is the RAFT hot-loop fix (BASELINE north-star).

    Dtype-adaptive: a bf16 pyramid (``build_corr_pyramid(fast=True)``,
    serving mode) is contracted with bf16 tap matrices at DEFAULT
    precision (fp32 accumulation) — the lookup is bandwidth-bound at
    level-0 shapes (docs/PERF.md), so halving the volume bytes halves its
    cost.  An fp32 pyramid keeps the HIGHEST-precision parity path.
    Output is float32 either way.
    """
    B, H, W, _ = coords.shape
    r = radius
    n = 2 * r + 1
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)

    fast = pyramid[0].dtype == jnp.bfloat16
    tap_dtype = jnp.bfloat16 if fast else jnp.float32
    prec = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST

    N = B * H * W
    cx = coords[..., 0].reshape(N).astype(jnp.float32)
    cy = coords[..., 1].reshape(N).astype(jnp.float32)

    # Lane-fill pad (docs/PERF.md round 4): sub-128 x extents (levels ≥1:
    # 60/30/15 at the 512×960 point) push XLA's batched-contraction
    # emitters into a fixed-overhead regime costing MORE than level 0's
    # full volume (profiled 0.43 vs 0.26 ms/iter).  Zero x-columns meet
    # zero tap weights, so padding to the 128-lane tile is exact; the
    # tap matrices for padded levels are built AT the padded width —
    # weights landing in the pad multiply zero volume columns, which is
    # precisely the reference's zero-padding semantics.
    shapes = [c.shape[1:3] for c in pyramid]
    pad_lvls = [l for l, (h, w) in enumerate(shapes) if h > 1 and 1 < w < 128]

    out_levels = []
    for lvl, corr in enumerate(pyramid):
        Hl, Wl = corr.shape[1:3]
        inv_scale = jnp.float32(0.5**lvl)
        # degenerate-axis quirk of the reference's grid_sample roundtrip:
        # a size-1 level axis maps EVERY window position (center + offsets)
        # to pixel 0 (see ops.warp.bilinear_sampler docstring)
        if lvl in pad_lvls:
            # built at the TRUE width then zero-padded: the explicit pad
            # is what XLA exploits (building directly at width 128
            # measured 28.2 vs 31.9 fps — docs/PERF.md round 4)
            ax = jnp.pad(
                _tap_matrix(cx * inv_scale, offs, Wl),
                ((0, 0), (0, 0), (0, 128 - Wl)),
            )
        elif Wl == 1:
            ax = _tap_matrix(jnp.zeros_like(cx), jnp.zeros_like(offs), Wl)
        else:
            ax = _tap_matrix(cx * inv_scale, offs, Wl)  # [N, n, Wl]
        if Hl == 1:
            ay = _tap_matrix(jnp.zeros_like(cy), jnp.zeros_like(offs), Hl)
        else:
            ay = _tap_matrix(cy * inv_scale, offs, Hl)  # [N, n, Hl]
        c = corr[..., 0]  # [N, Hl, Wl] (bf16 stays bf16 in fast mode)
        if not fast:
            c = c.astype(jnp.float32)
        if lvl in pad_lvls:
            # loop-invariant pad of the volume (XLA hoists it out of the
            # refinement scan)
            c = jnp.pad(c, ((0, 0), (0, 0), (0, 128 - Wl)))
        # contract x taps then y taps; fp32 accumulation either way.
        # Intermediate emitted [N, n, Hl] (NOT [N, Hl, n]): a 9-wide minor
        # dim makes XLA lower the batched contraction through conv-window
        # emitters at ~60-100× the FLOP floor — the qiy form measured
        # 1.6× faster at identical math (docs/PERF.md round 4, the
        # profiled RAFT-loop hot spot).
        tmp = jnp.einsum(
            "qyx,qix->qiy", c, ax.astype(tap_dtype),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [N, n, Hl]
        win = jnp.einsum(
            "qiy,qjy->qij", tmp.astype(tap_dtype) if fast else tmp,
            ay.astype(tap_dtype),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [N, n(x-major), n(y)]
        out_levels.append(win.reshape(B, H, W, n * n))
    return jnp.concatenate(out_levels, axis=-1)
