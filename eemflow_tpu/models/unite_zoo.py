"""'unite' enhancement frontends for the baseline zoo — MIMO-UNet-little
event-density reconstruction + selective-kernel fusion wrapped around each
family's standard two-volume forward.

Reference surface (all five follow one template: ``self.unet =
MIMOUNet_little(...)``, ``self.unet_sk = SK()``, enhance both volumes, then
the family's normal forward on the fused result):

  * ``model/GMA/unite_GMA.py:44`` ``RAFTGMARES`` (``with_res`` configurable
    via a ``without_res`` config key) and ``:171`` ``RAFTGMARES_IN``
    (instance-norm cnet),
  * ``model/GMflow/unite_gmflow.py:17`` ``GMFlowRES`` (``with_res=False``),
  * ``model/GMflownet/unite_gmflownet.py:43`` ``GMFlowNetRES`` / ``:204``
    ``GMFlowNetRES_IN``,
  * ``model/flowformer/unite_flowformer.py:25`` ``FlowFormerRES``,
  * ``model/SKflow/models/unite_sknet.py:49`` ``SKNetRES`` / ``:170``
    ``SKNetRES_IN``.

Every reference variant imports the repo's missing ``model/MIMO_unet``
module (SURVEY §2.12 defect); the frontend here is the reimplemented
``models/unet.MIMOUNet`` at the paper's "little" width.  Rather than five
near-identical classes, one wrapper composes the (already TPU-native)
backbone modules — the backbones pad internally, so the wrapper only pads
for the frontend's /4 downsampling.

Returns the reference contract ``(map_list, flow_list)`` where
``map_list[-1]`` is the pair of fused (enhanced) input volumes the
visualization hooks consume (``train_mvsec.py:101-108``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from eemflow_tpu.models.sknet import SKFuse
from eemflow_tpu.models.unet import MIMOUNet
from eemflow_tpu.ops.pad import InputPadder

# backbone registry name → (module class factory, accepts iters kwarg)
_BACKBONES = ("gma", "gmflow", "gmflownet", "flowformer", "skflow",
              "kpaflow")


def _build_backbone(backbone: str, n_first_channels: int, cnet_norm: str,
                    upsample_all: bool):
    # local imports keep model modules import-cycle-free
    if backbone == "gma":
        from eemflow_tpu.models.gma import RAFTGMA

        return RAFTGMA(n_first_channels=n_first_channels, cnet_norm=cnet_norm,
                       upsample_all=upsample_all, name="backbone"), True
    if backbone == "gmflow":
        from eemflow_tpu.models.gmflow import GMFlow

        return GMFlow(n_first_channels=n_first_channels, name="backbone"), False
    if backbone == "gmflownet":
        from eemflow_tpu.models.gmflownet import GMFlowNetModel

        return GMFlowNetModel(n_first_channels=n_first_channels,
                              cnet_norm=cnet_norm,
                              upsample_all=upsample_all, name="backbone"), True
    if backbone == "flowformer":
        from eemflow_tpu.models.flowformer import FlowFormer

        return FlowFormer(n_first_channels=n_first_channels,
                          name="backbone"), False
    if backbone == "skflow":
        from eemflow_tpu.models.skflow import SKFlow

        return SKFlow(n_first_channels=n_first_channels, cnet_norm=cnet_norm,
                      upsample_all=upsample_all, name="backbone"), True
    if backbone == "kpaflow":
        from eemflow_tpu.models.kpaflow import KPAFlow

        # reference unite_kpa.py RAFTKPARES(_IN) — dead upstream (the
        # hard-coded author sys.path + missing MIMO_unet import), rebuilt
        # here as a live frontend
        return KPAFlow(n_first_channels=n_first_channels,
                       cnet_norm=cnet_norm, name="backbone"), True
    raise ValueError(f"unknown unite backbone {backbone!r}; "
                     f"expected one of {_BACKBONES}")


class UniteZoo(nn.Module):
    """MIMO-UNet-little + SK-fusion frontend around a zoo backbone."""

    backbone: str = "gma"
    n_first_channels: int = 5
    with_res: bool = False  # True only for RAFTGMARES (unite_GMA.py:110-114)
    cnet_norm: str = "batch"  # "instance" = the reference ``_IN`` variants
    mimo_base: int = 8  # MIMOUNet_little width (half the full net's 16)
    upsample_all: bool = True  # False = final-only convex upsample (eval)

    @nn.compact
    def __call__(self, events1, events2, iters: Optional[int] = None,
                 train: bool = False):
        B, H, W, _ = events1.shape
        # the frontend downsamples /4; pad bottom/right only so the coarse
        # maps unpad by exact prefix crops (the reference's full-res unpad
        # of coarse maps is a latent shape bug — see ops/pad.py 'downscale')
        padder = InputPadder((H, W), mode="downscale", eval_pad_rate=8)
        im1, im2 = padder.pad(events1, events2)

        unet = MIMOUNet(out_ch=self.n_first_channels, base=self.mimo_base,
                        name="unet")
        outs1 = unet(im1, with_res=self.with_res, train=train)
        outs2 = unet(im2, with_res=self.with_res, train=train)
        sk = SKFuse(name="unet_sk")
        image1 = padder.unpad(sk(im1, outs1[-1]))
        image2 = padder.unpad(sk(im2, outs2[-1]))

        net, takes_iters = _build_backbone(
            self.backbone, self.n_first_channels, self.cnet_norm,
            self.upsample_all,
        )
        if takes_iters:
            _, flows = net(image1, image2, iters=iters, train=train)
        else:
            _, flows = net(image1, image2, train=train)

        # per-scale exact crops: scale-s output of the padded frame covers
        # the unpadded content in its [:H//s, :W//s] prefix
        maps = []
        for o1, o2 in zip(outs1, outs2):
            s = im1.shape[1] // o1.shape[1]
            maps.append((o1[:, : H // s, : W // s], o2[:, : H // s, : W // s]))
        maps[-1] = (image1, image2)
        return maps, flows
