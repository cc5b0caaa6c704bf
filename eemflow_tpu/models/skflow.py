"""SKFlow — super-kernel update blocks + GMA aggregation
(reference ``model/SKflow/models/sk_decoder.py`` + ``SKflow/update.py``).

Same E-RAFT skeleton; the update block replaces plain convs with PCBlocks —
residual depthwise large-kernel mixers (k_conv=[1,15]) with pointwise FFNs
(``update.py:8-32``) — and a GMA-style global aggregator; the GRU itself is
a PCBlock over [net, inp, motion, motion_global] (PCUpdater_conv=[1,7]).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.eraft import coords_grid
from eemflow_tpu.models.gma import GMAAggregate, GMAAttention
from eemflow_tpu.models.layers import conv2d
from eemflow_tpu.models.raft_core import BasicEncoder
from eemflow_tpu.ops.corr_block import build_corr_pyramid, lookup_corr_pyramid
from eemflow_tpu.ops.pad import InputPadder
from eemflow_tpu.ops.upsample import convex_upsample_flow


class PCBlock(nn.Module):
    """Residual depthwise large-kernel mixer (reference update.py:8-32)."""

    c_in: int
    c_out: int
    k_conv: Sequence[int] = (1, 15)

    @nn.compact
    def __call__(self, x):
        mid = int(1.5 * self.c_in)
        y = conv2d(mid, 1, 1, 0, name="ffn1_0")(x)
        x = nn.gelu(x + conv2d(self.c_in, 1, 1, 0, name="ffn1_2")(nn.gelu(y, approximate=False)),
                    approximate=False)
        for i, k in enumerate(self.k_conv):
            x = nn.gelu(
                x + conv2d(self.c_in, k, 1, k // 2, groups=self.c_in,
                           name=f"conv_list_{i}")(x),
                approximate=False,
            )
        x = nn.gelu(x + conv2d(self.c_in, 1, 1, 0, name="pw")(x), approximate=False)
        y = conv2d(mid, 1, 1, 0, name="ffn2_0")(x)
        return conv2d(self.c_out, 1, 1, 0, name="ffn2_2")(nn.gelu(y, approximate=False))


class SKMotionEncoder(nn.Module):
    k_conv: Sequence[int] = (1, 15)

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.gelu(PCBlock(corr.shape[-1], 256, self.k_conv, name="convc1")(corr),
                      approximate=False)
        cor = PCBlock(256, 192, self.k_conv, name="convc2")(cor)
        flo = conv2d(128, 1, 1, 0, name="convf1")(flow)
        flo = PCBlock(128, 64, self.k_conv, name="convf2")(flo)
        out = PCBlock(256, 126, self.k_conv, name="conv")(
            jnp.concatenate([cor, flo], axis=-1)
        )
        return jnp.concatenate([out, flow], axis=-1)


class SKUpdateBlock(nn.Module):
    hidden_dim: int = 128
    k_conv: Sequence[int] = (1, 15)
    updater_conv: Sequence[int] = (1, 7)

    @nn.compact
    def __call__(self, net, inp, corr, flow, attention):
        motion = SKMotionEncoder(self.k_conv, name="encoder")(flow, corr)
        motion_global = GMAAggregate(128, name="aggregator")(attention, motion)
        gru_in = jnp.concatenate([net, inp, motion, motion_global], axis=-1)
        net = PCBlock(gru_in.shape[-1], 128, self.updater_conv, name="gru")(gru_in)
        delta_flow = PCBlock(128, 2, self.k_conv, name="flow_head")(net)
        mask = conv2d(256, 3, 1, 1, name="mask_0")(net)
        mask = conv2d(64 * 9, 1, 1, 0, name="mask_2")(nn.relu(mask))
        return net, 0.25 * mask, delta_flow


class SKFlow(nn.Module):
    """reference SK_Decoder. NOTE: predictions are NOT unpadded/unscaled
    beyond the standard convex upsampling (the reference applies no padder)."""

    n_first_channels: int = 5
    iters: int = 12
    hidden_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    pad_rate: int = 8
    upsample_all: bool = True  # False = final-only convex upsample (eval)
    corr_fast: bool = False  # bf16 corr matmuls, fp32 accum (serving mode)
    cnet_norm: str = "batch"  # "instance" for the unite RES_IN variants

    @nn.compact
    def __call__(self, events1, events2, iters: Optional[int] = None, train=False):
        n_iters = self.iters if iters is None else iters
        B, H, W, _ = events1.shape
        padder = InputPadder((H, W), mode="chairs", eval_pad_rate=self.pad_rate)
        im1, im2 = padder.pad(events1, events2)

        fnet = BasicEncoder(256, "instance", self.n_first_channels, name="fnet")
        fmap1, fmap2 = fnet(im1), fnet(im2)
        pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels,
                                     fast=self.corr_fast)

        cnet = BasicEncoder(256, self.cnet_norm, self.n_first_channels, name="cnet")(
            im1, train=train
        )
        net = nn.tanh(cnet[..., :128])
        inp = nn.relu(cnet[..., 128:])
        attention = GMAAttention(128, name="att")(inp)

        h8, w8 = im1.shape[1] // 8, im1.shape[2] // 8
        coords0 = coords_grid(B, h8, w8)

        update_block = SKUpdateBlock(self.hidden_dim, name="update_block")
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
            body, variable_broadcast="params", split_rngs={"params": False},
            length=n_iters,
        )
        mask0 = jnp.zeros(coords0.shape[:3] + (64 * 9,), net.dtype)
        (_, coords1, up_mask), flows = scan(
            update_block, (net, coords0, mask0), None
        )
        if not self.upsample_all:  # final-only convex upsample (eval mode)
            flows = convex_upsample_flow(coords1 - coords0, up_mask)[None]
        return (events1, events2), padder.unpad(flows)
