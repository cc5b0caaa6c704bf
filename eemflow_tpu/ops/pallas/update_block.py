"""Fused RAFT update block — the BASELINE north-star fusion
(lookup + motion-encoder + GRU per SURVEY §7 step 5; reference
``model/update.py:63-106``): the per-iteration conv stack of the
refinement loop as two banded Pallas kernels.

* ``motion_encoder_fused`` — convc1(1×1,324→256) → convc2(3×3,→192) ∥
  convf1(7×7,2→128) → convf2(3×3,→64) → conv(3×3,256→126) → concat with
  flow (→128), all LeakyReLU-free (plain ReLU), one pass over row bands.
* ``gru_flowhead_fused`` — both SepConvGRU stages (1×5 then 5×1, three
  gates each over [h, x] with x = [inp, motion]) + the 2-conv FlowHead,
  one pass.  The convex-upsample mask head stays outside (eval mode
  computes it once on the final net — ``raft_refine``).

Why two kernels, not one: together the block carries ~2.7 M conv params;
splitting keeps each kernel's weights + row bands + matmul temporaries
inside VMEM at fp32 without tiny tiles.

Semantics match the flax modules exactly: every conv is zero-padded
"same"; the kernels compute on margin-padded planes and re-zero
out-of-image rows/cols after every conv so padding never leaks bias/
gate values (the gates' σ(0)=½ would otherwise bleed in).  Interpret-
mode parity tests: ``tests/test_pallas_kernels.py``.

The profiled motivation (docs/PROFILE_r3.md): the 12-iteration scan is
~2.4 ms/iteration on the v5e — ~10× the conv-FLOP floor — dominated by
fusion-boundary traffic XLA cannot remove.  This kernel is the A/B
candidate; if hardware measurement shows no win it joins the
negative-results ledger in docs/PERF.md.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MOTION_HALO = 5  # convf1(3) + convf2(1) + conv(1); corr path needs 2
# the 5×1 stage is TWO convs deep in rows — q reads r, itself a 5×1
# output (2+2) — plus two 3×3 flow-head convs (2); the 1×5 stage is
# likewise two convs deep in cols (4) + flow head (2), so the margin is
# symmetric at 6
_GRU_HALO = 6


def _f32(t):
    return jnp.asarray(t, jnp.float32)


def pack_motion_weights(enc: Dict) -> Tuple[jax.Array, ...]:
    """BasicMotionEncoder param subtree → flat fp32 (kernel, bias) list in
    kernel order: convc1, convc2, convf1, convf2, conv."""
    out = []
    for name in ("convc1", "convc2", "convf1", "convf2", "conv"):
        k = _f32(enc[name]["kernel"])
        out.append(k.reshape(-1, k.shape[-1]))  # (kh·kw·Cin, Cout) tap-major
        out.append(_f32(enc[name]["bias"]).reshape(1, -1))
    return tuple(out)


def pack_gru_flowhead_weights(gru: Dict, fh: Dict) -> Tuple[jax.Array, ...]:
    out = []
    for name in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
        k = _f32(gru[name]["kernel"])
        out.append(k.reshape(-1, k.shape[-1]))
        out.append(_f32(gru[name]["bias"]).reshape(1, -1))
    for name in ("conv1", "conv2"):
        k = _f32(fh[name]["kernel"])
        out.append(k.reshape(-1, k.shape[-1]))
        out.append(_f32(fh[name]["bias"]).reshape(1, -1))
    return tuple(out)


def _conv(plane, w, b, kh, kw, compute_dtype, keep):
    """Zero-pad 'same' conv on a fixed-size margin plane via accumulated
    tap matmuls; re-zeroes out-of-image positions afterwards.

    plane: (R, Wp, Cin) with all out-of-image entries zero.  w: tap-major
    (kh·kw·Cin, Cout).  keep: (R, Wp, 1) fp32 {0,1} in-image mask — fp32
    because Mosaic cannot insert a minor dim on i1 vectors ("Insertion of
    minor dim that is not a no-op only supported for 32-bit types"), so
    masking is multiplicative, never a bool ``where``."""
    R, Wp, C = plane.shape
    gh, gw = kh // 2, kw // 2
    rows, cols = R - 2 * gh, Wp - 2 * gw
    cout = w.shape[1]
    y = b * jnp.ones((rows * cols, 1), jnp.float32)
    t = 0
    for dy in range(kh):
        for dx in range(kw):
            xt = jax.lax.slice(
                plane, (dy, dx, 0), (rows + dy, cols + dx, C)
            ).reshape(rows * cols, C)
            y = y + jnp.dot(
                xt.astype(compute_dtype),
                w[t * C : (t + 1) * C].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            t += 1
    y = jnp.pad(
        y.reshape(rows, cols, cout), ((gh, gh), (gw, gw), (0, 0))
    )
    return y * keep


def _band(prev, cur, nxt, halo, i, tile_rows, H, m):
    """Assemble the (tile+2·halo)-row band from neighbor blocks, mask
    out-of-image rows, margin-pad the columns by m."""
    band = jnp.concatenate(
        [prev[0, -halo:], cur[0], nxt[0, :halo]], axis=0
    ).astype(jnp.float32)
    rows0 = (
        jax.lax.broadcasted_iota(jnp.int32, band.shape[:2] + (1,), 0)
        + i * tile_rows - halo
    )
    rmask = ((rows0 >= 0) & (rows0 < H)).astype(jnp.float32)
    band = band * rmask
    return jnp.pad(band, ((0, 0), (m, m), (0, 0)))


def _keep_mask(R, Wp, W, m, i, tile_rows, H, halo):
    """(R, Wp, 1) fp32 {0,1} in-image mask (see ``_conv`` for why fp32)."""
    rows = (
        jax.lax.broadcasted_iota(jnp.int32, (R, Wp, 1), 0)
        + i * tile_rows - halo
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, Wp, 1), 1)
    keep = (rows >= 0) & (rows < H) & (cols >= m) & (cols < m + W)
    return keep.astype(jnp.float32)


def _motion_kernel(tile_rows, H, W, compute_dtype, *refs):
    (cp, cc, cn, fp, fc, fn,
     wc1, bc1, wc2, bc2, wf1, bf1, wf2, bf2, wo, bo,
     out_ref) = refs
    i = pl.program_id(1)
    h, m = _MOTION_HALO, _MOTION_HALO
    corr = _band(cp, cc, cn, h, i, tile_rows, H, m)
    flow = _band(fp, fc, fn, h, i, tile_rows, H, m)
    R, Wp, _ = corr.shape
    keep = _keep_mask(R, Wp, W, m, i, tile_rows, H, h)

    relu = lambda x: jnp.maximum(x, 0.0)
    c = relu(_conv(corr, wc1[:], bc1[:], 1, 1, compute_dtype, keep))
    c = relu(_conv(c, wc2[:], bc2[:], 3, 3, compute_dtype, keep))
    f = relu(_conv(flow, wf1[:], bf1[:], 7, 7, compute_dtype, keep))
    f = relu(_conv(f, wf2[:], bf2[:], 3, 3, compute_dtype, keep))
    o = relu(_conv(jnp.concatenate([c, f], axis=-1), wo[:], bo[:],
                   3, 3, compute_dtype, keep))
    motion = jnp.concatenate([o, flow], axis=-1)
    out_ref[0] = motion[h : h + tile_rows, m : m + W].astype(out_ref.dtype)


def _gru_kernel(tile_rows, H, W, compute_dtype, *refs):
    (np_, nc, nn_, ip, ic, in_, mp, mc, mn,
     wz1, bz1, wr1, br1, wq1, bq1, wz2, bz2, wr2, br2, wq2, bq2,
     w1, b1, w2, b2,
     net_ref, delta_ref) = refs
    i = pl.program_id(1)
    h, m = _GRU_HALO, _GRU_HALO
    net = _band(np_, nc, nn_, h, i, tile_rows, H, m)
    inp = _band(ip, ic, in_, h, i, tile_rows, H, m)
    mot = _band(mp, mc, mn, h, i, tile_rows, H, m)
    R, Wp, _ = net.shape
    keep = _keep_mask(R, Wp, W, m, i, tile_rows, H, h)

    x = jnp.concatenate([inp, mot], axis=-1)

    def stage(hcur, kh, kw, wz, bz, wr, br, wq, bq):
        hx = jnp.concatenate([hcur, x], axis=-1)
        z = jax.nn.sigmoid(_conv(hx, wz, bz, kh, kw, compute_dtype, keep))
        r = jax.nn.sigmoid(_conv(hx, wr, br, kh, kw, compute_dtype, keep))
        rx = jnp.concatenate([r * hcur, x], axis=-1)
        q = jnp.tanh(_conv(rx, wq, bq, kh, kw, compute_dtype, keep))
        return ((1.0 - z) * hcur + z * q) * keep

    h1 = stage(net, 1, 5, wz1[:], bz1[:], wr1[:], br1[:], wq1[:], bq1[:])
    h2 = stage(h1, 5, 1, wz2[:], bz2[:], wr2[:], br2[:], wq2[:], bq2[:])

    d = jnp.maximum(_conv(h2, w1[:], b1[:], 3, 3, compute_dtype, keep), 0.0)
    delta = _conv(d, w2[:], b2[:], 3, 3, compute_dtype, keep)

    net_ref[0] = h2[h : h + tile_rows, m : m + W].astype(net_ref.dtype)
    delta_ref[0] = delta[h : h + tile_rows, m : m + W].astype(delta_ref.dtype)


def _pick_tile(H, halo):
    # smaller tiles first: the kernels' weight tables alone are 3.6/7.1 MB
    # fp32, so row bands must stay small to fit VMEM (halo recompute is
    # the cheap currency here — the loop is memory-bound, not FLOP-bound)
    for d in (8, 10, 12, 16, 6, 5):
        if H % d == 0 and d >= halo:
            return d
    return None


def _neighbor_specs(shapes, tile_rows, T):
    specs = []
    for shp in shapes:
        for d in (-1, 0, 1):
            specs.append(
                pl.BlockSpec(
                    (1, tile_rows) + shp[2:],
                    functools.partial(
                        lambda b, i, d: (b, jnp.clip(i + d, 0, T - 1), 0, 0),
                        d=d,
                    ),
                    memory_space=pltpu.VMEM,
                )
            )
    return specs


def _weight_specs(ws):
    return [
        pl.BlockSpec(t.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM)
        for t in ws
    ]


def _interp():
    return jax.default_backend() == "cpu"


# Mosaic's default scoped-VMEM budget is 16 MB; these kernels' row bands +
# unrolled tap-matmul temporaries need ~39 MB at the 512×960 (/8 = 64×120)
# point.  The v5e's physical VMEM is 128 MB, so raising the per-kernel
# limit is the correct fix (measured compile+run OK at 48 MB, round 4) —
# not shrinking tiles below the halo.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def motion_encoder_fused(corr, flow, weights, compute_dtype=jnp.float32,
                         interpret: bool = False):
    """corr [B,H,W,Cc], flow [B,H,W,2] → motion [B,H,W,126+2], fp32."""
    B, H, W, _ = corr.shape
    tr = _pick_tile(H, _MOTION_HALO)
    assert tr is not None, f"no row tile for H={H}"
    T = H // tr
    args = [corr, corr, corr, flow, flow, flow, *weights]
    in_specs = _neighbor_specs([corr.shape, flow.shape], tr, T)
    in_specs += _weight_specs(weights)
    cout = weights[-1].shape[1] + 2  # conv out + concat flow
    return pl.pallas_call(
        functools.partial(_motion_kernel, tr, H, W, compute_dtype),
        grid=(B, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tr, W, cout), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), jnp.float32),
        interpret=interpret or _interp(),
        compiler_params=_COMPILER_PARAMS,
    )(*args)


def gru_flowhead_fused(net, inp, motion, weights,
                       compute_dtype=jnp.float32, interpret: bool = False):
    """net/inp/motion [B,H,W,128] → (net' [B,H,W,128], Δflow [B,H,W,2])."""
    B, H, W, C = net.shape
    tr = _pick_tile(H, _GRU_HALO)
    assert tr is not None, f"no row tile for H={H}"
    T = H // tr
    args = [net, net, net, inp, inp, inp, motion, motion, motion, *weights]
    in_specs = _neighbor_specs([net.shape, inp.shape, motion.shape], tr, T)
    in_specs += _weight_specs(weights)
    return pl.pallas_call(
        functools.partial(_gru_kernel, tr, H, W, compute_dtype),
        grid=(B, T),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tr, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, W, 2), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W, 2), jnp.float32),
        ],
        interpret=interpret or _interp(),
        compiler_params=_COMPILER_PARAMS,
    )(*args)


def tiles_ok(H: int) -> bool:
    """True when the /8 grid height admits a row tiling covering both
    kernels' halos (callers fall back to the module path otherwise)."""
    return (_pick_tile(H, _MOTION_HALO) is not None
            and _pick_tile(H, _GRU_HALO) is not None)


def make_fused_update(update_params: Dict, compute_dtype=jnp.float32):
    """BasicUpdateBlock param subtree → fn(net, inp, corr, flow) →
    (net', Δflow), running both fused kernels (mask head excluded — the
    caller computes it once on the final net).  Check ``tiles_ok(H)``
    first."""
    mot_w = pack_motion_weights(update_params["encoder"])
    gru_w = pack_gru_flowhead_weights(
        update_params["gru"], update_params["flow_head"]
    )

    def apply(net, inp, corr, flow):
        motion = motion_encoder_fused(
            corr.astype(jnp.float32), flow.astype(jnp.float32), mot_w,
            compute_dtype,
        )
        net2, delta = gru_flowhead_fused(
            net.astype(jnp.float32), inp.astype(jnp.float32), motion, gru_w,
            compute_dtype,
        )
        return net2, delta

    return apply
