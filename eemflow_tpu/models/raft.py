"""Original image RAFT (3-channel, reference ``model/raft.py:27-147``) —
kept for the image baselines.  Identical to E-RAFT with image inputs
normalized to [-1, 1] (reference raft.py forward) and no event-specific
padding default (pad rate 8)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.eraft import coords_grid, raft_refine
from eemflow_tpu.models.raft_core import BasicEncoder, BasicUpdateBlock
from eemflow_tpu.ops.corr_block import build_corr_pyramid
from eemflow_tpu.ops.pad import InputPadder


class RAFT(nn.Module):
    n_first_channels: int = 3
    iters: int = 12
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    pad_rate: int = 8
    upsample_all: bool = True  # False = final-only convex upsample (eval)
    corr_fast: bool = False  # bf16 corr matmuls, fp32 accum (serving mode)
    normalize_input: bool = True

    @nn.compact
    def __call__(self, image1, image2, iters: Optional[int] = None,
                 flow_init: Optional[jax.Array] = None, train: bool = False):
        n_iters = self.iters if iters is None else iters
        B, H, W, _ = image1.shape
        if self.normalize_input:
            image1 = 2 * (image1 / 255.0) - 1.0
            image2 = 2 * (image2 / 255.0) - 1.0
        padder = InputPadder((H, W), mode="sintel", eval_pad_rate=self.pad_rate)
        im1, im2 = padder.pad(image1, image2)

        fnet = BasicEncoder(256, "instance", self.n_first_channels, name="fnet")
        fmap1, fmap2 = fnet(im1), fnet(im2)
        pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels,
                                     fast=self.corr_fast)

        cnet = BasicEncoder(
            self.hidden_dim + self.context_dim, "batch", self.n_first_channels,
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
        flows = raft_refine(
            update_block, pyramid, net, inp, coords0, coords1, n_iters,
            self.corr_radius, upsample_all=self.upsample_all,
        )
        return (image1, image2), padder.unpad(flows)
