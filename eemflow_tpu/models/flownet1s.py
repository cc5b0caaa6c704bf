"""FlowNet1S family — FlowNetS encoder/decoder variants adapted to event
voxels (reference ``model/IRRPWC/flownet1s*.py`` + ``IRR_FlowNet.py``,
shared plumbing in ``flownet_modules.py``).

One configurable module covers the reference's six files:

  * ``flownet1s``            — plain FlowNetS on concat(im1, im2)
                               (``flownet1s.py:10-119``)
  * ``flownet1s_irr``        — shared 3-conv stem per image; the decoder is
                               re-applied ``num_iters`` times with the
                               second view's conv3 features warped by the
                               accumulated flow (``flownet1s_irr.py:96-157``)
  * ``flownet1s_irr_bi``     — + backward direction through the SAME
                               decoder (``flownet1s_irr_bi.py``)
  * ``flownet1s_irr_occ``    — + a mirrored occlusion decoder
                               (``flownet1s_irr_occ.py:36-56``)
  * ``flownet1s_irr_occ_bi`` — both (``flownet1s_irr_occ_bi.py``)
  * ``IRR_FlowNet``          — irr+bi+occ plus per-iteration kernel
                               refinement (RefineFlow/RefineOcc) at conv2
                               resolution and occlusion shuffle-upsampling
                               to full resolution (``IRR_FlowNet.py:140-277``)

TPU notes: NHWC throughout; the ×2 decoder upsamplings are
``nn.ConvTranspose`` (k=4, s=2, p=1 — exact 2×, maps onto the MXU); the
iterative-residual loop has a static trip count so it unrolls into one
XLA program with no host round-trips.  The reference warps with a
linspace(-1,1) grid and flow normalized by ``size/div_flow``
(``flownet_modules.py:90-113`` — note: ``/W``, not ``/(W-1)`` as in the
PWC twin, and no validity mask); replicated here in exact pixel
coordinates.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.irrpwc import OccUpsampleNetwork, RefineFlow, RefineOcc
from eemflow_tpu.models.layers import Deconv as TorchDeconv
from eemflow_tpu.models.layers import conv2d, leaky_relu01
from eemflow_tpu.ops.upsample import resize_bilinear
from eemflow_tpu.ops.warp import grid_sample_pixel


def _deconv(features: int, use_bias: bool = False, name: Optional[str] = None):
    return TorchDeconv(features, use_bias=use_bias, name=name)


class DeconvRelu(nn.Module):
    """deconv(nonlinear=True): Sequential(ConvTranspose, LeakyReLU) -> the
    transposed conv is Sequential index '0'."""

    features: int

    @nn.compact
    def __call__(self, x):
        return leaky_relu01(TorchDeconv(self.features, use_bias=False, name="0")(x))


def flownet_warp(x, flow, height_im, width_im, div_flow):
    """Reference ``flownet_modules.WarpingLayer``: grid = linspace(-1,1)
    over the FEATURE size, flow normalized by 2/(size·div_flow); i.e. a
    pixel displacement of flow·(W_feat−1)/(W_im·div_flow) on the feature
    grid, align_corners=True, zero padding, no mask."""
    B, H, W, C = x.shape
    gx = jnp.broadcast_to(jnp.arange(W, dtype=flow.dtype)[None, None, :], (B, H, W))
    gy = jnp.broadcast_to(jnp.arange(H, dtype=flow.dtype)[None, :, None], (B, H, W))
    px = gx + flow[..., 0] * ((W - 1) / (width_im * div_flow))
    py = gy + flow[..., 1] * ((H - 1) / (height_im * div_flow))
    return grid_sample_pixel(x, px, py, align_corners=True)


def _adaptive_avg_pool(x, oh, ow):
    """torch adaptive_avg_pool2d: output cell (i,j) averages input rows
    [floor(i*H/oh), ceil((i+1)*H/oh)) x the analogous columns."""
    B, H, W, C = x.shape
    rows = jnp.stack(
        [jnp.mean(x[:, (i * H) // oh : -((-(i + 1) * H) // oh)], axis=1)
         for i in range(oh)], axis=1)
    return jnp.stack(
        [jnp.mean(rows[:, :, (j * W) // ow : -((-(j + 1) * W) // ow)], axis=2)
         for j in range(ow)], axis=2)


def _cat_as(tensors, ref):
    """concatenate_as (reference flownet_modules.py:35-55): resize every
    tensor to ref's spatial dims — adaptive average pooling when the target
    is smaller (the reference picks the branch by LEXICOGRAPHIC list
    comparison of [h, w]; replicated), bilinear align_corners=True
    otherwise — then concat on channels."""
    h, w = ref.shape[1:3]
    outs = []
    for t in tensors:
        th, tw = t.shape[1:3]
        if (th, tw) == (h, w):
            outs.append(t)
        elif [h, w] < [th, tw]:  # lexicographic, as in resize2D
            outs.append(_adaptive_avg_pool(t, h, w))
        else:
            outs.append(resize_bilinear(t, (h, w), align_corners=True))
    return jnp.concatenate(outs, axis=-1)


class _Decoder(nn.Module):
    """One FlowNetS decoder arm (flow: out_ch=2, occ: out_ch=1) —
    reference flownet1s.py:69-92 / flownet1s_irr_occ_bi.py:104-128."""

    out_ch: int = 2
    tag: str = "flow"

    @nn.compact
    def __call__(self, conv2, conv3_1, conv4_1, conv5_1, conv6_1):
        def predict(x, name):
            return conv2d(self.out_ch, 3, 1, name=name)(x)

        def upsample(x, name):
            return _deconv(self.out_ch, name=name)(x)

        t = self.tag
        p6 = predict(conv6_1, f"predict_{t}6")
        up5 = upsample(p6, f"upsample_{t}6_to_5")
        d5 = DeconvRelu(512, name=f"deconv_{t}5")(conv6_1)
        c5 = _cat_as((conv5_1, d5, up5), conv5_1)
        p5 = predict(c5, f"predict_{t}5")
        up4 = upsample(p5, f"upsample_{t}5_to_4")
        d4 = DeconvRelu(256, name=f"deconv_{t}4")(c5)
        c4 = _cat_as((conv4_1, d4, up4), conv4_1)
        p4 = predict(c4, f"predict_{t}4")
        up3 = upsample(p4, f"upsample_{t}4_to_3")
        d3 = DeconvRelu(128, name=f"deconv_{t}3")(c4)
        c3 = _cat_as((conv3_1, d3, up3), conv3_1)
        p3 = predict(c3, f"predict_{t}3")
        up2 = upsample(p3, f"upsample_{t}3_to_2")
        d2 = DeconvRelu(64, name=f"deconv_{t}2")(c3)
        c2 = _cat_as((conv2, d2, up2), conv2)
        p2 = predict(c2, f"predict_{t}2")
        return p2, p3, p4, p5, p6


class _FlowNetSCore(nn.Module):
    """Shared encoder tail + decoder(s): conv3_1..conv6_1 over the
    (concatenated) conv3 features, then the flow decoder and, optionally,
    a mirrored occlusion decoder."""

    occ: bool = False

    @nn.compact
    def __call__(self, conv2_im1, conv3_cat):
        def enc(f, k, s, name):
            return lambda x: leaky_relu01(
                conv2d(f, k, s, name=f"{name}_0")(x)
            )

        conv3_1 = enc(256, 3, 1, "conv3_1")(conv3_cat)
        conv4_1 = enc(512, 3, 1, "conv4_1")(enc(512, 3, 2, "conv4")(conv3_1))
        conv5_1 = enc(512, 3, 1, "conv5_1")(enc(512, 3, 2, "conv5")(conv4_1))
        conv6_1 = enc(1024, 3, 1, "conv6_1")(enc(1024, 3, 2, "conv6")(conv5_1))

        flows = _Decoder(2, "flow", name="flow_decoder")(
            conv2_im1, conv3_1, conv4_1, conv5_1, conv6_1
        )
        if not self.occ:
            return flows, None
        occs = _Decoder(1, "occ", name="occ_decoder")(
            conv2_im1, conv3_1, conv4_1, conv5_1, conv6_1
        )
        return flows, occs


class FlowNet1S(nn.Module):
    """The FlowNet1S variant family.  ``__call__(ev1, ev2) → (maps, preds)``
    with preds = full-resolution forward-flow predictions (÷div_flow),
    ordered coarse→fine (plain) or per-iteration (irr); maps = (occ_f,
    occ_b | None) finest occlusion logits when ``occ`` else the inputs.

    Flags map to reference files: ``irr=False`` → flownet1s.py;
    ``irr=True`` (+``bi``/``occ``) → flownet1s_irr{,_bi,_occ,_occ_bi}.py.
    """

    n_first_channels: int = 5
    div_flow: float = 0.05
    irr: bool = False
    bi: bool = False
    occ: bool = False
    num_iters: int = 3

    @nn.compact
    def __call__(self, events1, events2, train: bool = False):
        B, H, W, _ = events1.shape
        core = _FlowNetSCore(self.occ, name="flownets")

        def up_full(f):
            return resize_bilinear(f, (H, W), align_corners=True) * (
                1.0 / self.div_flow
            )

        if not self.irr:
            # plain FlowNetS: full stem over channel-concat of both views
            # (flownet1s.py:19-28); wider stem (64/128/256), no sharing.
            x = jnp.concatenate([events1, events2], axis=-1)
            c1 = leaky_relu01(conv2d(64, 7, 2, name="conv1_0")(x))
            c2 = leaky_relu01(conv2d(128, 5, 2, name="conv2_0")(c1))
            c3 = leaky_relu01(conv2d(256, 5, 2, name="conv3_0")(c2))
            flows, occs = core(c2, c3)
            preds = [up_full(f) for f in flows[::-1]]  # coarse→fine
            if occs is not None:  # contract: (occ_f full-res, occ_b | None)
                occ_full = resize_bilinear(
                    occs[0], (H, W), align_corners=True
                )
                maps = (occ_full, None)
            else:
                maps = (events1, events2)
            return maps, preds

        # IRR: shared narrow stem per image (flownet1s_irr.py:100-113)
        s1 = conv2d(32, 7, 2, name="conv1_0")
        s2 = conv2d(64, 5, 2, name="conv2_0")
        s3 = conv2d(128, 5, 2, name="conv3_0")

        def stem(x):
            c1 = leaky_relu01(s1(x))
            c2 = leaky_relu01(s2(c1))
            c3 = leaky_relu01(s3(c2))
            return c2, c3

        c2_1, c3_1 = stem(events1)
        c2_2, c3_2 = stem(events2)
        c3_2_wp, c3_1_wp = c3_2, c3_1

        acc_f = acc_b = None  # accumulated per-scale flow/occ tuples
        occ_acc_f = occ_acc_b = None
        preds = []
        occ_out = None
        for it in range(self.num_iters):
            flows_f, occs_f = core(c2_1, jnp.concatenate([c3_1, c3_2_wp], -1))
            acc_f = (
                flows_f
                if acc_f is None
                else tuple(a + f for a, f in zip(acc_f, flows_f))
            )
            if self.occ and occs_f is not None:
                occ_acc_f = (
                    occs_f
                    if occ_acc_f is None
                    else tuple(a + o for a, o in zip(occ_acc_f, occs_f))
                )
            if self.bi:
                flows_b, occs_b = core(c2_2, jnp.concatenate([c3_2, c3_1_wp], -1))
                acc_b = (
                    flows_b
                    if acc_b is None
                    else tuple(a + f for a, f in zip(acc_b, flows_b))
                )
                if self.occ and occs_b is not None:
                    occ_acc_b = (
                        occs_b
                        if occ_acc_b is None
                        else tuple(a + o for a, o in zip(occ_acc_b, occs_b))
                    )

            preds.append(up_full(acc_f[0]))
            if self.occ:
                occ_out = (
                    resize_bilinear(occ_acc_f[0], (H, W), align_corners=True),
                    resize_bilinear(occ_acc_b[0], (H, W), align_corners=True)
                    if self.bi
                    else None,
                )

            if it < self.num_iters - 1:
                uf = resize_bilinear(acc_f[0], c3_2.shape[1:3], align_corners=True)
                c3_2_wp = flownet_warp(c3_2, uf, H, W, self.div_flow)
                if self.bi:
                    ub = resize_bilinear(
                        acc_b[0], c3_1.shape[1:3], align_corners=True
                    )
                    c3_1_wp = flownet_warp(c3_1, ub, H, W, self.div_flow)

        maps = occ_out if self.occ else (events1, events2)
        return maps, preds


class IRRFlowNet(nn.Module):
    """IRR-FlowNet combined net (reference ``IRR_FlowNet.py:140-277``):
    the irr+bi+occ FlowNet1S loop plus, per iteration, kernel-prediction
    refinement of flow/occ at conv2 resolution (RefineFlow/RefineOcc on
    warped-image differences, irr_modules.py) and occlusion
    shuffle-upsampling to full resolution.  The refined full-res flow of
    the PREVIOUS iteration re-warps the conv3 features of the next.

    Returns maps = (occ_f, occ_b) full-res, preds = per-iteration full-res
    forward flows (÷div_flow applied at eval parity point, IRR_FlowNet.py:274).
    """

    n_first_channels: int = 5
    div_flow: float = 0.05
    num_iters: int = 3

    @nn.compact
    def __call__(self, events1, events2, train: bool = False):
        B, H, W, _ = events1.shape
        core = _FlowNetSCore(True, name="flownets")
        refine_flow = RefineFlow(name="refine_flow")
        refine_occ = RefineOcc(name="refine_occ")
        occ_upsample = OccUpsampleNetwork(name="occ_shuffle_upsample")

        s1 = conv2d(32, 7, 2, name="conv1_0")
        s2 = conv2d(64, 5, 2, name="conv2_0")
        s3 = conv2d(128, 5, 2, name="conv3_0")

        def stem(x):
            c1 = leaky_relu01(s1(x))
            c2 = leaky_relu01(s2(c1))
            c3 = leaky_relu01(s3(c2))
            return c2, c3

        c2_1, c3_1 = stem(events1)
        c2_2, c3_2 = stem(events2)
        c3_2_wp, c3_1_wp = c3_2, c3_1

        h2, w2 = c2_1.shape[1:3]
        # NOTE the reference additionally accumulates the raw per-scale
        # decoder outputs across iterations into its training dict
        # (IRR_FlowNet.py:211-220, consumed by its multi-scale loss); this
        # rebuild supervises the per-iteration full-res refined predictions
        # (sequence loss) instead, so only the flow1/occ1 path is carried.
        prev_flow1_f = prev_flow1_b = None  # refined flow @conv2 res
        prev_occ1_f = prev_occ1_b = None
        occ_f = occ_b = None
        preds = []
        for it in range(self.num_iters):
            flows_f, occs_f = core(c2_1, jnp.concatenate([c3_1, c3_2_wp], -1))
            flows_b, occs_b = core(c2_2, jnp.concatenate([c3_2, c3_1_wp], -1))
            if it == 0:
                f2_f, f2_b = flows_f[0], flows_b[0]
                o2_f, o2_b = occs_f[0], occs_b[0]
            else:
                # residual on the previous REFINED estimate (IRR_FlowNet.py:222-225)
                f2_f = flows_f[0] + resize_bilinear(
                    prev_flow1_f, flows_f[0].shape[1:3], align_corners=True
                )
                f2_b = flows_b[0] + resize_bilinear(
                    prev_flow1_b, flows_b[0].shape[1:3], align_corners=True
                )
                o2_f = occs_f[0] + resize_bilinear(
                    prev_occ1_f, occs_f[0].shape[1:3], align_corners=True
                )
                o2_b = occs_b[0] + resize_bilinear(
                    prev_occ1_b, occs_b[0].shape[1:3], align_corners=True
                )

            # refine at conv2 resolution (IRR_FlowNet.py:228-246)
            f2_f = resize_bilinear(f2_f, (h2, w2), align_corners=True)
            f2_b = resize_bilinear(f2_b, (h2, w2), align_corners=True)
            o2_f = resize_bilinear(o2_f, (h2, w2), align_corners=True)
            o2_b = resize_bilinear(o2_b, (h2, w2), align_corners=True)

            img1_r = resize_bilinear(events1, (h2, w2), align_corners=True)
            img2_r = resize_bilinear(events2, (h2, w2), align_corners=True)
            img2_wp = flownet_warp(img2_r, f2_f, H, W, self.div_flow)
            img1_wp = flownet_warp(img1_r, f2_b, H, W, self.div_flow)

            flow1_f = refine_flow(
                jax.lax.stop_gradient(f2_f), img1_r - img2_wp, c2_1
            )
            flow1_b = refine_flow(
                jax.lax.stop_gradient(f2_b), img2_r - img1_wp, c2_2
            )

            c2_2_wp = flownet_warp(c2_2, flow1_f, H, W, self.div_flow)
            c2_1_wp = flownet_warp(c2_1, flow1_b, H, W, self.div_flow)
            occ1_f = refine_occ(jax.lax.stop_gradient(o2_f), c2_1, c2_1 - c2_2_wp)
            occ1_b = refine_occ(jax.lax.stop_gradient(o2_b), c2_2, c2_2 - c2_1_wp)
            prev_flow1_f, prev_flow1_b = flow1_f, flow1_b
            prev_occ1_f, prev_occ1_b = occ1_f, occ1_b

            # full-res flow + occlusion shuffle-upsample (IRR_FlowNet.py:249-261)
            flow_full_f = resize_bilinear(flow1_f, (H, W), align_corners=True)
            flow_full_b = resize_bilinear(flow1_b, (H, W), align_corners=True)
            preds.append(flow_full_f * (1.0 / self.div_flow))

            im2_wp = flownet_warp(events2, flow_full_f, H, W, self.div_flow)
            im1_wp = flownet_warp(events1, flow_full_b, H, W, self.div_flow)
            fb_wp = flownet_warp(flow_full_b, flow_full_f, H, W, self.div_flow)
            ff_wp = flownet_warp(flow_full_f, flow_full_b, H, W, self.div_flow)

            # the shuffle-upsample input is this iteration's REFINED
            # conv2-res occlusion (IRR_FlowNet.py:245-260 reuses occ_f)
            occ_f = occ_upsample(
                occ1_f,
                jnp.concatenate([events1, im2_wp, flow_full_f, fb_wp], -1),
            )
            occ_b = occ_upsample(
                occ1_b,
                jnp.concatenate([events2, im1_wp, flow_full_b, ff_wp], -1),
            )

            if it < self.num_iters - 1:
                ff_r = resize_bilinear(
                    flow_full_f, c3_2.shape[1:3], align_corners=True
                )
                fb_r = resize_bilinear(
                    flow_full_b, c3_1.shape[1:3], align_corners=True
                )
                c3_2_wp = flownet_warp(c3_2, ff_r, H, W, self.div_flow)
                c3_1_wp = flownet_warp(c3_1, fb_r, H, W, self.div_flow)

        return (occ_f, occ_b), preds
