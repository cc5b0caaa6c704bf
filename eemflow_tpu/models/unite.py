"""'unite' variants — event-density enhancement frontends + E-RAFT backbone
(reference ``model/unite_unet_raft.py`` + ``model/unite_raft.py``).

All share: a UNet-family frontend enhances the raw voxel grids, an optional
selective-kernel fusion blends enhanced with raw, then the standard RAFT
refinement runs on the result.  The reference's unite family uses
**instance**-norm context encoders (``unite_unet_raft.py:75-76``) unlike
plain E-RAFT's batch-norm cnet.

  * ``UNetERAFT``    — UNet frontend + SK fusion (reference ``ERAFT:53``),
  * ``UNetDenseCTX`` — dense volumes as context (reference
    ``ERAFT_denseCTX:201``): fnet sees the sparse volumes, cnet the dense,
  * ``MIMOUNetERAFT`` — MIMO-UNet multi-scale frontend (reference
    ``MIMOUNET_ERAFT:337``); ``use_sk`` adds SK fusion (``_RES`` variant,
    reference ``MIMOUNET_RES_ERAFT:481``),
  * ``DenoiseERAFT`` — learned denoise key-maps + 3×3 max-filter
    sparsification (reference ``unite_raft.py:41-113``).

Returned maps list mirrors the reference contract (map_list[0/1] are the
network inputs for visualization hooks, ``train_mvsec.py:101-108``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.eraft import coords_grid, raft_refine
from eemflow_tpu.models.raft_core import BasicEncoder, BasicUpdateBlock
from eemflow_tpu.models.sknet import SKFuse
from eemflow_tpu.models.unet import MIMOUNet, UNet
from eemflow_tpu.ops.corr_block import build_corr_pyramid
from eemflow_tpu.ops.pad import InputPadder


class _RaftTail(nn.Module):
    """fnet/cnet/corr/refine shared by every unite variant."""

    n_channels: int
    iters: int = 12
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    cnet_norm: str = "instance"
    upsample_all: bool = True  # False = final-only convex upsample (eval)

    @nn.compact
    def __call__(self, image1, image2, ctx_image=None, n_iters=None, train=False):
        n_iters = self.iters if n_iters is None else n_iters
        fnet = BasicEncoder(256, "instance", self.n_channels, name="fnet")
        fmap1 = fnet(image1)
        fmap2 = fnet(image2)
        pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels)

        cnet_in = image1 if ctx_image is None else ctx_image
        cnet = BasicEncoder(
            self.hidden_dim + self.context_dim, self.cnet_norm, self.n_channels,
            name="cnet",
        )(cnet_in, train=train)
        net = nn.tanh(cnet[..., : self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim :])

        B = image1.shape[0]
        h8, w8 = image1.shape[1] // 8, image1.shape[2] // 8
        coords0 = coords_grid(B, h8, w8)

        update_block = BasicUpdateBlock(
            self.hidden_dim, self.corr_levels, self.corr_radius, name="update_block"
        )
        return raft_refine(
            update_block, pyramid, net, inp, coords0, coords0, n_iters,
            self.corr_radius, upsample_all=self.upsample_all,
        )


class UNetERAFT(nn.Module):
    """UNet enhancement + SK fusion + RAFT (reference unite_unet_raft.ERAFT:53)."""

    n_first_channels: int = 5
    iters: int = 12
    pad_rate: int = 32
    upsample_all: bool = True  # False = final-only convex upsample (eval)

    @nn.compact
    def __call__(self, events1, events2, iters: Optional[int] = None, train=False):
        B, H, W, _ = events1.shape
        padder = InputPadder((H, W), mode="chairs", eval_pad_rate=self.pad_rate)
        im1, im2 = padder.pad(events1, events2)

        unet = UNet(out_ch=self.n_first_channels, name="unet")
        u1 = unet(im1, train=train)
        u2 = unet(im2, train=train)
        sk = SKFuse(name="unet_sk")
        image1 = sk(im1, u1)
        image2 = sk(im2, u2)

        flows = _RaftTail(self.n_first_channels, self.iters,
                          upsample_all=self.upsample_all, name="raft")(
            image1, image2, n_iters=iters, train=train
        )
        flows = padder.unpad(flows)
        return (padder.unpad(image1), padder.unpad(image2)), flows


class UNetDenseCTX(nn.Module):
    """Sparse volumes through fnet, dense volumes as context
    (reference ERAFT_denseCTX:201)."""

    n_first_channels: int = 5
    iters: int = 12
    pad_rate: int = 32
    upsample_all: bool = True  # False = final-only convex upsample (eval)

    @nn.compact
    def __call__(self, events1, events2, d_events1=None, d_events2=None,
                 iters: Optional[int] = None, train=False):
        if d_events1 is None:
            d_events1, d_events2 = events1, events2
        B, H, W, _ = events1.shape
        padder = InputPadder((H, W), mode="chairs", eval_pad_rate=self.pad_rate)
        im1, im2 = padder.pad(events1, events2)
        dim1, _ = padder.pad(d_events1, d_events2)

        flows = _RaftTail(self.n_first_channels, self.iters,
                          upsample_all=self.upsample_all, name="raft")(
            im1, im2, ctx_image=dim1, n_iters=iters, train=train
        )
        flows = padder.unpad(flows)
        return (events1, events2), flows


class MIMOUNetERAFT(nn.Module):
    """MIMO-UNet multi-scale enhancement + RAFT
    (reference MIMOUNET_ERAFT:337 / MIMOUNET_RES_ERAFT:481 with use_sk)."""

    n_first_channels: int = 5
    iters: int = 12
    pad_rate: int = 32
    with_res: bool = True
    use_sk: bool = False
    upsample_all: bool = True  # False = final-only convex upsample (eval)

    @nn.compact
    def __call__(self, events1, events2, iters: Optional[int] = None, train=False):
        B, H, W, _ = events1.shape
        # bottom/right-only padding so the multi-scale maps unpad by exact
        # prefix crops (fixes the reference's full-res unpad of coarse maps,
        # model/unite_unet_raft.py:459-462; identical at rate-divisible sizes)
        padder = InputPadder((H, W), mode="downscale", eval_pad_rate=self.pad_rate)
        im1, im2 = padder.pad(events1, events2)

        unet = MIMOUNet(out_ch=self.n_first_channels, name="unet")
        outs1 = unet(im1, with_res=self.with_res, train=train)
        outs2 = unet(im2, with_res=self.with_res, train=train)
        image1, image2 = outs1[-1], outs2[-1]
        if self.use_sk:
            sk = SKFuse(name="unet_sk")
            image1 = sk(im1, image1)
            image2 = sk(im2, image2)

        flows = _RaftTail(self.n_first_channels, self.iters,
                          upsample_all=self.upsample_all, name="raft")(
            image1, image2, n_iters=iters, train=train
        )
        flows = padder.unpad(flows)
        # multi-scale enhanced volumes, finest last (reference contract);
        # scale-s maps carry the unpadded content in their [:H//s, :W//s]
        # prefix (bottom/right-only padding above)
        maps = []
        for o1, o2 in zip(outs1, outs2):
            s = im1.shape[1] // o1.shape[1]
            maps.append((o1[:, : H // s, : W // s], o2[:, : H // s, : W // s]))
        maps[-1] = (padder.unpad(image1), padder.unpad(image2))
        return maps, flows


class DenoiseERAFT(nn.Module):
    """Learned event-denoise key-maps with 3×3 max-filter sparsification
    (reference unite_raft.py:41-159: UNet → key maps → keep only local
    maxima → RAFT on the sparsified maps)."""

    n_first_channels: int = 5
    key_kernels: int = 5
    filter_size: int = 3
    iters: int = 12
    pad_rate: int = 32
    upsample_all: bool = True  # False = final-only convex upsample (eval)

    @nn.compact
    def __call__(self, events1, events2, iters: Optional[int] = None, train=False):
        B, H, W, _ = events1.shape
        padder = InputPadder((H, W), mode="chairs", eval_pad_rate=self.pad_rate)
        im1, im2 = padder.pad(events1, events2)

        unet = UNet(out_ch=self.key_kernels, name="unet")
        k1 = unet(im1, train=train)
        k2 = unet(im2, train=train)

        def max_filter(x):
            fs = self.filter_size
            p = fs // 2
            m = nn.max_pool(x, (fs, fs), strides=(1, 1), padding=((p, p), (p, p)))
            return x * (x >= m).astype(x.dtype)

        image1 = max_filter(k1)
        image2 = max_filter(k2)

        flows = _RaftTail(self.key_kernels, self.iters,
                          upsample_all=self.upsample_all, name="raft")(
            image1, image2, n_iters=iters, train=train
        )
        flows = padder.unpad(flows)
        return (padder.unpad(image1), padder.unpad(image2)), flows
