"""GMA — RAFT + Global Motion Aggregation (reference ``model/GMA/network.py``
``RAFTGMA`` + ``model/GMA/gma.py``).

Same E-RAFT skeleton (instance fnet / batch cnet, corr pyramid, SepConvGRU)
plus a single-head content self-attention over the context features whose
attention map aggregates the motion features globally each iteration
(``GMAUpdateBlock``, reference ``GMA/update.py:112-139``): the GRU input is
[inp, motion, motion_global].

The HREM entry point runs with heads=1, position_only=False,
position_and_content=False (``network.py:27-37``) — the relative position
embedding exists in checkpoints but is dead; the converter drops it
(``GMA_DROP``).

TPU notes: attention is one [B, HW, HW] MXU matmul at /8 resolution,
computed once outside the scan; the aggregation matmul rides inside the
scan body.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.layers import conv2d
from eemflow_tpu.models.raft_core import (
    BasicEncoder,
    BasicMotionEncoder,
    FlowHead,
    SepConvGRU,
)
from eemflow_tpu.models.eraft import coords_grid
from eemflow_tpu.ops.corr_block import build_corr_pyramid, lookup_corr_pyramid
from eemflow_tpu.ops.pad import InputPadder
from eemflow_tpu.ops.upsample import convex_upsample_flow

GMA_DROP = ("att.pos_emb",)


class GMAAttention(nn.Module):
    """Content self-attention map (reference ``gma.py:34-78``, heads=1)."""

    dim_head: int = 128

    @nn.compact
    def __call__(self, fmap):
        B, H, W, C = fmap.shape
        qk = nn.Conv(2 * self.dim_head, (1, 1), use_bias=False, name="to_qk")(fmap)
        q, k = jnp.split(qk, 2, axis=-1)
        q = q * (self.dim_head**-0.5)
        sim = jnp.einsum(
            "bxyd,buvd->bxyuv",
            q,
            k,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(B, H * W, H * W)
        return jax.nn.softmax(sim, axis=-1)


class GMAAggregate(nn.Module):
    """Attention-weighted global aggregation with learned residual gate
    (reference ``gma.py:81-115``)."""

    dim: int = 128

    @nn.compact
    def __call__(self, attn, fmap):
        B, H, W, C = fmap.shape
        v = nn.Conv(self.dim, (1, 1), use_bias=False, name="to_v")(fmap)
        out = jnp.einsum(
            "bij,bjd->bid",
            attn,
            v.reshape(B, H * W, self.dim),
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(B, H, W, self.dim)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return fmap + gamma * out


class GMAUpdateBlock(nn.Module):
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, net, inp, corr, flow, attention):
        motion = BasicMotionEncoder(name="encoder")(flow, corr)
        motion_global = GMAAggregate(128, name="aggregator")(attention, motion)
        gru_in = jnp.concatenate([inp, motion, motion_global], axis=-1)
        net = SepConvGRU(self.hidden_dim, name="gru")(net, gru_in)
        delta_flow = FlowHead(256, name="flow_head")(net)
        mask = conv2d(256, 3, 1, 1, name="mask_0")(net)
        mask = conv2d(64 * 9, 1, 1, 0, name="mask_2")(nn.relu(mask))
        return net, 0.25 * mask, delta_flow


class RAFTGMA(nn.Module):
    n_first_channels: int = 5
    iters: int = 12
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    pad_rate: int = 32
    upsample_all: bool = True  # False = final-only convex upsample (eval)
    corr_fast: bool = False  # bf16 corr matmuls, fp32 accum (serving mode)
    cnet_norm: str = "batch"  # "instance" for the unite RES_IN variants

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

        fnet = BasicEncoder(256, "instance", self.n_first_channels, name="fnet")
        fmap1 = fnet(im1)
        fmap2 = fnet(im2)
        pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels,
                                     fast=self.corr_fast)

        cnet = BasicEncoder(
            self.hidden_dim + self.context_dim, self.cnet_norm,
            self.n_first_channels, name="cnet",
        )(im1, train=train)
        net = nn.tanh(cnet[..., : self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim :])
        attention = GMAAttention(self.context_dim, name="att")(inp)

        h8, w8 = im1.shape[1] // 8, im1.shape[2] // 8
        coords0 = coords_grid(B, h8, w8)
        coords1 = coords0 if flow_init is None else coords0 + flow_init

        update_block = GMAUpdateBlock(self.hidden_dim, name="update_block")
        radius = self.corr_radius

        def body(mdl, carry, _):
            net, coords1, _ = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr = lookup_corr_pyramid(pyramid, coords1, radius).astype(net.dtype)
            flow = (coords1 - coords0).astype(net.dtype)
            net, up_mask, delta_flow = mdl(net, inp, corr, flow, attention)
            coords1 = coords1 + delta_flow
            flow_up = (
                convex_upsample_flow(coords1 - coords0, up_mask)
                if self.upsample_all else None
            )
            return (net, coords1, up_mask), flow_up

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=n_iters,
        )
        mask0 = jnp.zeros((B, h8, w8, 64 * 9), net.dtype)
        (_, coords1, up_mask), flows = scan(
            update_block, (net, coords1, mask0), None
        )
        if not self.upsample_all:  # final-only convex upsample (eval mode)
            flows = convex_upsample_flow(coords1 - coords0, up_mask)[None]
        flows = padder.unpad(flows)
        return (events1, events2), flows
