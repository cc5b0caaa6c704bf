"""DCEIFlow — event-voxel + single-image fusion flow
(reference ``model/SDCEImodel/DCEIFlow.py`` + ``decoder/with_event_updater.py``;
the encoder/updater are the family's copies of the shared RAFT core —
``backbone/raft_encoder.py``, ``decoder/raft_updater.py`` — implemented once
in ``models.raft_core``).

RAFT skeleton where the second view is *synthesized*: the image features
(fnet) fuse with event features (enet) through ``EIFusion`` (two 1×1
branches + 3×3 merge + residual, ``DCEIFlow.py:26-38``) to form a pseudo
second feature map for the correlation volume; the update block's motion
encoder additionally consumes the event features (``with_event_updater.py:
90-112``), and there is no convex-upsample mask (bilinear ×8 upsampling).

Inputs follow the reference contract: image normalized 2·(img/255)−1,
events 2·voxel−1 (``DCEIFlow.py:123-127``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.eraft import coords_grid
from eemflow_tpu.models.layers import conv2d
from eemflow_tpu.models.raft_core import BasicEncoder, FlowHead, SepConvGRU
from eemflow_tpu.ops.corr_block import build_corr_pyramid, lookup_corr_pyramid
from eemflow_tpu.ops.pad import InputPadder
from eemflow_tpu.ops.upsample import upflow8


class EIFusion(nn.Module):
    input_dim: int = 256

    @nn.compact
    def __call__(self, x1, x2):
        c1 = nn.relu(conv2d(192, 1, 1, 0, name="conv1")(x1))
        c2 = nn.relu(conv2d(192, 1, 1, 0, name="conv2")(x2))
        out = nn.relu(
            conv2d(self.input_dim, 3, 1, 1, name="convo")(
                jnp.concatenate([c1, c2], axis=-1)
            )
        )
        return out + x1


class DCEIMotionEncoder(nn.Module):
    @nn.compact
    def __call__(self, flow, emap, corr):
        cor = nn.relu(conv2d(256, 1, 1, 0, name="convc1")(corr))
        cor = nn.relu(conv2d(192, 3, 1, 1, name="convc2")(cor))
        ema = nn.relu(conv2d(128, 1, 1, 0, name="conve1")(emap))
        ema = nn.relu(conv2d(64, 3, 1, 1, name="conve2")(ema))
        flo = nn.relu(conv2d(128, 7, 1, 3, name="convf1")(flow))
        flo = nn.relu(conv2d(64, 3, 1, 1, name="convf2")(flo))
        out = nn.relu(
            conv2d(126, 3, 1, 1, name="conv")(
                jnp.concatenate([cor, ema, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)


class DCEIUpdateBlock(nn.Module):
    """BasicUpdateBlockNoMask (reference with_event_updater.py:156-171)."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, net, inp, corr, emap, flow):
        motion = DCEIMotionEncoder(name="encoder")(flow, emap, corr)
        gru_in = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, name="gru")(net, gru_in)
        delta_flow = FlowHead(256, name="flow_head")(net)
        return net, delta_flow


class DCEIFlow(nn.Module):
    n_first_channels: int = 5
    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4
    image_channels: int = 3
    pad_rate: int = 8

    @nn.compact
    def __call__(self, event_voxel, image1, iters: Optional[int] = None,
                 train: bool = False):
        """event_voxel: [B,H,W,2·bins]; image1: [B,H,W,3] in [0,255]."""
        n_iters = self.iters if iters is None else iters
        B, H, W, _ = image1.shape
        padder = InputPadder((H, W), mode="chairs", eval_pad_rate=self.pad_rate)
        image1, event_voxel = padder.pad(
            2 * (image1 / 255.0) - 1.0, 2 * event_voxel - 1.0
        )

        emap = BasicEncoder(
            256, "instance", event_voxel.shape[-1], name="enet"
        )(event_voxel)
        fmap1 = BasicEncoder(
            256, "instance", self.image_channels, name="fnet"
        )(image1)
        pseudo_fmap2 = EIFusion(256, name="fusion")(fmap1, emap)
        pyramid = build_corr_pyramid(fmap1, pseudo_fmap2, self.corr_levels)

        cnet = BasicEncoder(256, "batch", self.image_channels, name="cnet")(
            image1, train=train
        )
        net = nn.tanh(cnet[..., :128])
        inp = nn.relu(cnet[..., 128:])

        h8, w8 = image1.shape[1] // 8, image1.shape[2] // 8
        coords0 = coords_grid(B, h8, w8)

        update_block = DCEIUpdateBlock(128, name="update_block")
        radius = self.corr_radius

        def body(mdl, carry, _):
            net, coords1 = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr = lookup_corr_pyramid(pyramid, coords1, radius).astype(net.dtype)
            flow = (coords1 - coords0).astype(net.dtype)
            net, delta = mdl(net, inp, corr, emap, flow)
            coords1 = coords1 + delta
            return (net, coords1), upflow8(coords1 - coords0)

        scan = nn.scan(
            body, variable_broadcast="params", split_rngs={"params": False},
            length=n_iters,
        )
        (_, _), flows = scan(update_block, (net, coords0), None)
        return (event_voxel, event_voxel), padder.unpad(flows)
