"""RAFT-GMA RNN variant over raw event segments
(reference ``model/GMA/gma_rnn.py:40-170`` ``RAFTGMA_rnn``).

A sequence of raw event segments is converted to feature images by the
point transformer (``models.event_transformer``); the context/attention come
from the first segment's image, then GMA refinement runs between the first
image and each subsequent segment image.  The GRU state carries across
segments (the "rnn"), each segment restarts from the previous flow scaled
by (i+1)/i, and only the LAST segment's iterations emit upsampled
predictions (reference ``gma_rnn.py:94-160``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.eraft import coords_grid
from eemflow_tpu.models.event_transformer import EventTransformer
from eemflow_tpu.models.gma import GMAAttention, GMAUpdateBlock
from eemflow_tpu.models.raft_core import BasicEncoder
from eemflow_tpu.ops.corr_block import build_corr_pyramid, lookup_corr_pyramid
from eemflow_tpu.ops.pad import InputPadder
from eemflow_tpu.ops.upsample import convex_upsample_flow


class RAFTGMA_RNN(nn.Module):
    n_first_channels: int = 5
    iters: int = 6
    corr_levels: int = 4
    corr_radius: int = 4
    image_size: tuple = (64, 64)
    pad_rate: int = 32

    @nn.compact
    def __call__(self, event_segments, iters: Optional[int] = None,
                 train: bool = False):
        """event_segments: [B, S, N, 4] raw event segments (S ≥ 2)."""
        n_iters = self.iters if iters is None else iters
        B, S, N, _ = event_segments.shape
        H, W = self.image_size

        evt = EventTransformer(
            C=self.n_first_channels, Cn=self.n_first_channels * 2,
            image_size=self.image_size, name="ev_transformer",
        )
        images = [evt(event_segments[:, s]) for s in range(S)]

        padder = InputPadder((H, W), mode="chairs", eval_pad_rate=self.pad_rate)
        image1 = padder.pad(images[0])[0]

        cnet = BasicEncoder(256, "batch", self.n_first_channels, name="cnet")(
            image1, train=train
        )
        net0 = nn.tanh(cnet[..., :128])
        inp = nn.relu(cnet[..., 128:])
        attention = GMAAttention(128, name="att")(inp)

        fnet = BasicEncoder(256, "instance", self.n_first_channels, name="fnet")
        fmap1 = fnet(image1)
        update_block = GMAUpdateBlock(128, name="update_block")

        h8, w8 = image1.shape[1] // 8, image1.shape[2] // 8
        coords0 = coords_grid(B, h8, w8)

        # reference semantics (gma_rnn.py:115-160): the GRU state ``net``
        # carries ACROSS segments (the "rnn"), each segment starts from the
        # previous segment's flow scaled by (i+1)/i (constant-velocity
        # extrapolation to the longer baseline), and only the LAST
        # segment's iterations emit upsampled predictions.
        preds = []
        net = net0
        flow_init = jnp.zeros_like(coords0)
        for s in range(1, S):
            image2 = padder.pad(images[s])[0]
            fmap2 = fnet(image2)
            pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels)
            coords1 = coords0 + flow_init
            for _ in range(n_iters):
                coords1 = jax.lax.stop_gradient(coords1)
                corr = lookup_corr_pyramid(pyramid, coords1, self.corr_radius).astype(net.dtype)
                flow = (coords1 - coords0).astype(net.dtype)
                net, up_mask, delta = update_block(net, inp, corr, flow, attention)
                coords1 = coords1 + delta
                if s == S - 1:
                    preds.append(
                        padder.unpad(
                            convex_upsample_flow(coords1 - coords0, up_mask)
                        )
                    )
            flow_init = (coords1 - coords0) * (s + 1) / s
        return (images[0], images[-1]), preds
