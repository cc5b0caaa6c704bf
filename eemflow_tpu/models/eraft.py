"""E-RAFT — event RAFT (reference ``model/eraft.py:39-217``).

Structure: instance-norm feature encoder (fnet, 256-d) + batch-norm context
encoder (cnet, 128+128), all-pairs correlation pyramid, then 12 iterations of
{multi-scale corr lookup → motion encoder → SepConvGRU → Δflow + convex
upsample}.  All iterations return upsampled, unpadded predictions.

TPU design: the refinement loop is a single ``nn.scan``/``lax.scan`` over the
update block with broadcast weights — one compiled loop body, no host round
trips, no 12× HLO duplication (the BASELINE north-star).  ``coords1`` is
gradient-stopped at each iteration start, matching the reference's
``.detach()`` (``eraft.py:141``).

Returns the stacked predictions [iters, B, H, W, 2] (prediction list order:
final = index -1, as the reference's ``flow_predictions[-1]``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.raft_core import BasicEncoder, BasicUpdateBlock
from eemflow_tpu.ops.corr_block import build_corr_pyramid, lookup_corr_pyramid
from eemflow_tpu.ops.pad import InputPadder
from eemflow_tpu.ops.upsample import convex_upsample_flow


def coords_grid(batch: int, ht: int, wd: int) -> jax.Array:
    """[B, H, W, 2] (x, y) pixel coordinate grid (reference model_utils.py:24-27)."""
    xs = jnp.arange(wd, dtype=jnp.float32)
    ys = jnp.arange(ht, dtype=jnp.float32)
    gx = jnp.broadcast_to(xs[None, None, :], (batch, ht, wd))
    gy = jnp.broadcast_to(ys[None, :, None], (batch, ht, wd))
    return jnp.stack([gx, gy], axis=-1)


class ERAFT(nn.Module):
    n_first_channels: int = 5
    iters: int = 12
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    pad_rate: int = 32
    # False = eval-throughput mode: convex-upsample only the final iterate
    # (preds[-1] identical; ~20% faster forward — see raft_refine)
    upsample_all: bool = True
    # True = bf16 all-pairs corr matmuls with fp32 accumulation (serving
    # mode; parity mode keeps fp32/HIGHEST — see ops.corr_block)
    corr_fast: bool = False
    # one batched lookup einsum pair over all pyramid levels per iteration
    # (1-ulp-equivalent; see ops.corr_block.lookup_corr_stack).  Measured
    # NEGATIVE @512×960: 12.8 vs 17.0 fps — the level-0-extent padding
    # triples the contraction's data volume and the lookup is bandwidth-
    # bound (docs/PERF.md).  Kept as the recorded experiment; leave False.
    stacked_lookup: bool = False
    # eval-only: run the per-iteration update block (motion encoder + both
    # SepConvGRU stages + flow head) as two banded Pallas kernels
    # (ops/pallas/update_block.py) — the SURVEY §7 north-star fusion.
    # f32 math, parity to fp noise; requires upsample_all=False (the mask
    # head runs once on the final net).  fused_dtype="bf16" casts the
    # matmul operands (fp32 accumulation).
    fused_update: bool = False
    fused_dtype: str = "float32"
    # Round-5 out-of-loop lever (VERDICT r4 item 6): run the siamese fnet
    # on BOTH padded event volumes as ONE 2B-batch call instead of two
    # B-batch calls.  Convs are batch-parallel and instance norm is
    # per-sample, so per-frame results are identical (exact math); the
    # point is halving the encoder's op-count-bound dispatch tail — the
    # 9.5 ms/fwd outside the scan is ~705 small ops (docs/PERF.md round-4
    # floor analysis), and hand-fusing it with Pallas lost 1.4-1.8×.
    siamese_stack: bool = False

    @nn.compact
    def __call__(
        self,
        events1: jax.Array,
        events2: jax.Array,
        iters: Optional[int] = None,
        flow_init: Optional[jax.Array] = None,
        train: bool = False,
    ):
        n_iters = self.iters if iters is None else iters
        B, H, W, _ = events1.shape
        padder = InputPadder((H, W), mode="chairs", eval_pad_rate=self.pad_rate)
        im1, im2 = padder.pad(events1, events2)

        fnet = BasicEncoder(
            output_dim=256,
            norm_fn="instance",
            n_first_channels=self.n_first_channels,
            name="fnet",
        )
        if self.siamese_stack and not self.is_initializing():
            fmaps = fnet(jnp.concatenate([im1, im2], axis=0))
            fmap1, fmap2 = fmaps[:B], fmaps[B:]
        else:
            fmap1 = fnet(im1)
            fmap2 = fnet(im2)
        pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels,
                                     fast=self.corr_fast)

        cnet = BasicEncoder(
            output_dim=self.hidden_dim + self.context_dim,
            norm_fn="batch",
            n_first_channels=self.n_first_channels,
            name="cnet",
        )(im1, train=train)
        net = nn.tanh(cnet[..., : self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim :])

        h8, w8 = im1.shape[1] // 8, im1.shape[2] // 8
        coords0 = coords_grid(B, h8, w8)
        coords1 = coords0 if flow_init is None else coords0 + flow_init

        update_block = BasicUpdateBlock(
            self.hidden_dim, self.corr_levels, self.corr_radius, name="update_block"
        )
        fused_apply = None
        if (self.fused_update and not train and not self.is_initializing()
                and not self.upsample_all):
            from eemflow_tpu.ops.pallas.update_block import (
                make_fused_update,
                tiles_ok,
            )

            if tiles_ok(h8):
                cdt = (jnp.bfloat16
                       if self.fused_dtype in ("bf16", "bfloat16")
                       else jnp.float32)
                fused_apply = make_fused_update(
                    self.variables["params"]["update_block"], cdt
                )
        flows = raft_refine(
            update_block, pyramid, net, inp, coords0, coords1, n_iters,
            self.corr_radius, upsample_all=self.upsample_all,
            stacked_lookup=self.stacked_lookup, fused_apply=fused_apply,
        )
        # flows: [iters, B, Hp, Wp, 2] → unpad all iterations at once
        flows = padder.unpad(flows)
        return (events1, events2), flows


def raft_refine(update_block, pyramid, net, inp, coords0, coords1, n_iters,
                radius, upsample_all: bool = True,
                stacked_lookup: bool = False, fused_apply=None):
    """The shared RAFT refinement loop as one ``nn.scan`` — corr lookup,
    update block, convex upsample per iteration, weights broadcast.  Returns
    stacked upsampled predictions [iters, B, 8h, 8w, 2].

    ``upsample_all=False`` (eval-throughput mode): the convex upsample — a
    measured 1.25 ms/iteration at ERAFT's 512×960 point, ~20% of the whole
    forward — runs ONCE on the final iterate instead of inside the loop;
    returns a length-1 stack (``preds[-1]`` is unchanged, so every eval
    consumer sees identical flow).  Training needs every prediction for the
    γ-weighted sequence loss, hence the default."""

    if stacked_lookup:
        # one batched einsum pair over all levels per iteration instead of
        # one pair per level (per-level cost is fixed overhead, docs/
        # PERF.md); the zero-padded level stack is built ONCE here, outside
        # the scan, and broadcast into every iteration
        from eemflow_tpu.ops.corr_block import (
            build_corr_stack,
            lookup_corr_stack,
        )

        stack, shapes = build_corr_stack(pyramid)

        def lookup(coords):
            return lookup_corr_stack(stack, shapes, coords, radius)
    else:
        def lookup(coords):
            return lookup_corr_pyramid(pyramid, coords, radius)

    if fused_apply is not None:
        # fused update block (no params created in-body → plain lax.scan);
        # the mask head runs once on the final net below
        assert not upsample_all

        def fused_body(carry, _):
            net_c, c1 = carry
            c1 = jax.lax.stop_gradient(c1)
            corr = lookup(c1).astype(jnp.float32)
            flow = (c1 - coords0).astype(jnp.float32)
            net_c, delta = fused_apply(net_c.astype(jnp.float32), inp,
                                       corr, flow)
            return (net_c, c1 + delta.astype(c1.dtype)), None

        (net, coords1), _ = jax.lax.scan(
            fused_body, (net.astype(jnp.float32), coords1), None,
            length=n_iters,
        )
        up_mask = update_block.mask(net)
        return convex_upsample_flow(coords1 - coords0, up_mask)[None]

    def body(mdl, carry, _):
        net, coords1 = carry
        coords1 = jax.lax.stop_gradient(coords1)
        # corr values are looked up in fp32 (parity-sensitive); the GRU runs
        # at the carry dtype so bf16 mixed precision stays bf16 in-loop
        corr = lookup(coords1).astype(net.dtype)
        flow = (coords1 - coords0).astype(net.dtype)
        # eval-throughput mode: the convex-upsample mask head (~30% of the
        # update block's conv FLOPs) is deferred to the final net below
        net, up_mask, delta_flow = mdl(net, inp, corr, flow,
                                       compute_mask=upsample_all)
        coords1 = coords1 + delta_flow.astype(coords1.dtype)
        if upsample_all:
            flow_up = convex_upsample_flow(coords1 - coords0, up_mask)
        else:
            flow_up = None
        return (net, coords1), flow_up

    scan = nn.scan(
        body,
        variable_broadcast="params",
        split_rngs={"params": False},
        length=n_iters,
    )
    (net, coords1), flows = scan(update_block, (net, coords1), None)
    if not upsample_all:
        up_mask = update_block.mask(net)
        flows = convex_upsample_flow(coords1 - coords0, up_mask)[None]
    return flows
