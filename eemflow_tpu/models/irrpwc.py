"""IRR-PWC — iterative-residual PWC-Net adapted to event voxels
(reference ``model/IRRPWC/pwcnet_irr.py`` + ``pwc_modules.py``), plus the
full PWC variant family (``pwcnet{,_bi,_occ,_occ_bi,_irr_bi,_irr_occ,
_irr_occ_bi}.py`` — one configurable ``PWCFamilyNet``), the combined
``IRR_PWC.py`` net (``IRRPWCOcc``) and the MIMO-UNet-fronted
``unite_pwcnet_irr.py`` (``UnitePWCNet``).

6-level stride-2 conv pyramid (5→16→32→64→96→128→196 channels, coarse
first); at each of the 5 coarsest levels: warp the second-view features by
the upsampled flow (div_flow=0.05 normalization, reference
``pwcnet_irr.py:10,83-92``), 9×9 mean cost volume (the pure-PyTorch twin of
the CUDA correlation, ``pwc_modules.py:43-64`` — our shared
``local_correlation`` op), shared dense flow estimator + dilated context
network (iterative residual refinement: ONE estimator reused across
levels).  Predictions are upsampled to input size and ÷div_flow.

The reference's WarpingLayer builds its sampling grid with
``linspace(-1,1)`` + align_corners=True and masks by a warped-ones ≥ 1.0
threshold; we use the equivalent exact pixel-coordinate sampling with an
analytic in-bounds mask.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.layers import ConvRelu, conv2d, leaky_relu01
from eemflow_tpu.ops.correlation import local_correlation
from eemflow_tpu.ops.upsample import resize_bilinear
from eemflow_tpu.ops.warp import grid_sample_pixel


class FeatureExtractor(nn.Module):
    """Stride-2 conv pyramid, returned coarsest-first
    (reference pwc_modules.py:88-107)."""

    num_chs: Sequence[int] = (5, 16, 32, 64, 96, 128, 196)

    @nn.compact
    def __call__(self, x):
        pyramid = []
        for l, ch in enumerate(self.num_chs[1:]):
            x = ConvRelu(ch, stride=2, name=f"convs_{l}_0")(x)
            x = ConvRelu(ch, name=f"convs_{l}_1")(x)
            pyramid.append(x)
        return pyramid[::-1]


class FlowEstimatorDense(nn.Module):
    """Densely connected estimator (reference pwc_modules.py:157-175;
    out_ch=1 gives OccEstimatorDense, pwc_modules.py:190-208)."""

    out_ch: int = 2

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate((128, 128, 96, 64, 32)):
            y = ConvRelu(f, name=f"conv{i + 1}")(x)
            x = jnp.concatenate([y, x], axis=-1)
        out = conv2d(self.out_ch, 3, 1, name="conv_last_0")(x)
        return x, out


class ContextNetwork(nn.Module):
    """Dilated refinement (reference pwc_modules.py:212-228)."""

    out_ch: int = 2

    @nn.compact
    def __call__(self, x):
        cfg = [(128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1)]
        for i, (f, d) in enumerate(cfg):
            x = ConvRelu(f, dilation=d, name=f"convs_{i}")(x)
        return conv2d(self.out_ch, 3, 1, name="convs_6_0")(x)


def pwc_warp(x, flow, height_im, width_im, div_flow):
    """Reference WarpingLayer semantics in pixel coordinates: the flow is in
    input-image pixels × div_flow; scaled to the feature grid via the
    align_corners linspace grid (pwc_modules.py:110-136)."""
    B, H, W, C = x.shape
    gx = jnp.broadcast_to(jnp.arange(W, dtype=flow.dtype)[None, None, :], (B, H, W))
    gy = jnp.broadcast_to(jnp.arange(H, dtype=flow.dtype)[None, :, None], (B, H, W))
    sx = (W - 1) / max(width_im - 1, 1) / div_flow
    sy = (H - 1) / max(height_im - 1, 1) / div_flow
    px = gx + flow[..., 0] * sx
    py = gy + flow[..., 1] * sy
    out = grid_sample_pixel(x, px, py, align_corners=True)
    inb = (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
    return out * inb[..., None].astype(x.dtype)


def rescale_flow(flow, div_flow, width_im, height_im, to_local=True):
    """reference pwc_modules.py:151-155 (the mean!=0 guard is a no-op on
    values and not replicated)."""
    B, H, W, _ = flow.shape
    if to_local:
        scale = jnp.asarray(
            [W / width_im / div_flow, H / height_im / div_flow], flow.dtype
        )
    else:
        scale = jnp.asarray(
            [width_im * div_flow / W, height_im * div_flow / H], flow.dtype
        )
    return flow * scale


class PWCNet(nn.Module):
    """IRR-PWC. __call__(ev1, ev2) → ((ev1, ev2), flow list coarse→fine,
    each upsampled to input size and ÷div_flow)."""

    n_first_channels: int = 5
    div_flow: float = 0.05
    search_range: int = 4
    output_level: int = 4

    @nn.compact
    def __call__(self, events1, events2, train: bool = False):
        B, H, W, _ = events1.shape
        num_chs = (self.n_first_channels, 16, 32, 64, 96, 128, 196)
        fe = FeatureExtractor(num_chs, name="feature_pyramid_extractor")
        x1_pyr = fe(events1)
        x2_pyr = fe(events2)

        estimator = FlowEstimatorDense(name="flow_estimators")
        context = ContextNetwork(2, name="context_networks")
        conv1x1 = [
            ConvRelu(32, kernel_size=1, padding=0, name=f"conv_1x1_{l}")
            for l in range(5)
        ]

        flow = jnp.zeros(x1_pyr[0].shape[:3] + (2,), events1.dtype)
        preds = []
        for l, (x1, x2) in enumerate(zip(x1_pyr, x2_pyr)):
            if l == 0:
                x2_warp = x2
            else:
                flow = resize_bilinear(
                    flow, x1.shape[1:3], align_corners=True
                )
                x2_warp = pwc_warp(x2, flow, H, W, self.div_flow)

            corr = leaky_relu01(
                local_correlation(x1, x2_warp, self.search_range)
            )
            flow = rescale_flow(flow, self.div_flow, W, H, to_local=True)
            x1_1x1 = conv1x1[l](x1)
            x_intm, flow_res = estimator(
                jnp.concatenate([corr, x1_1x1, flow], axis=-1)
            )
            flow = flow + flow_res
            flow_fine = context(jnp.concatenate([x_intm, flow], axis=-1))
            flow = flow + flow_fine
            flow = rescale_flow(flow, self.div_flow, W, H, to_local=False)
            preds.append(
                resize_bilinear(flow, (H, W), align_corners=True)
                * (1.0 / self.div_flow)
            )
            if l == self.output_level:
                break

        return (events1, events2), preds


def _unfold3x3(x: jax.Array) -> jax.Array:
    """[B, H, W, 1] → [B, H, W, 9] 3×3 neighborhoods, replicate-padded
    (torch ReplicationPad2d + Unfold, reference irr_modules.py:70-103)."""
    xp = jnp.pad(x[..., 0], ((0, 0), (1, 1), (1, 1)), mode="edge")
    shifts = [
        xp[:, dy : dy + x.shape[1], dx : dx + x.shape[2]]
        for dy in range(3)
        for dx in range(3)
    ]
    return jnp.stack(shifts, axis=-1)


class RefineKernel(nn.Module):
    """Core of RefineFlow/RefineOcc (reference irr_modules.py:64-137):
    a conv stack predicts 9 per-pixel kernel logits; output channels are the
    softmax(-feat²)-weighted 3×3 neighborhood average of each input channel."""

    @nn.compact
    def __call__(self, target: jax.Array, feat_in: jax.Array) -> jax.Array:
        x = feat_in
        for i, f in enumerate((128, 128, 64, 64, 32, 32)):
            x = ConvRelu(f, name=f"convs_{i}")(x)
        feat = conv2d(9, 3, 1, name="convs_6_0")(x)
        kernel = jax.nn.softmax(-(feat**2), axis=-1)
        outs = [
            jnp.sum(_unfold3x3(target[..., c : c + 1]) * kernel, axis=-1)
            for c in range(target.shape[-1])
        ]
        return jnp.stack(outs, axis=-1)


class RefineFlow(nn.Module):
    """Kernel-refine flow: feat = [flow − mean(flow), ‖diff_img‖₂, feature]
    (reference irr_modules.py:64-103)."""

    @nn.compact
    def __call__(self, flow, diff_img, feature):
        flow_m = flow - jnp.mean(flow, axis=(1, 2), keepdims=True)
        norm2 = jnp.linalg.norm(diff_img, axis=-1, keepdims=True)
        feat_in = jnp.concatenate([flow_m, norm2, feature], axis=-1)
        return RefineKernel(name="kernel")(flow, feat_in)


class RefineOcc(nn.Module):
    """Kernel-refine occlusion: feat = [occ, feat1, feat2]
    (reference irr_modules.py:106-137)."""

    @nn.compact
    def __call__(self, occ, feat1, feat2):
        feat_in = jnp.concatenate([occ, feat1, feat2], axis=-1)
        return RefineKernel(name="kernel")(occ, feat_in)


class OccUpsampleNetwork(nn.Module):
    """Occlusion shuffle-upsample (reference irr_modules.py:30-57): nearest
    ×2 upsample of occ, residual conv refinement with 0.1-scaled res blocks."""

    feat_dim: int = 32

    @nn.compact
    def __call__(self, occ: jax.Array, x: jax.Array) -> jax.Array:
        occ = jax.image.resize(
            occ, (occ.shape[0], occ.shape[1] * 2, occ.shape[2] * 2, occ.shape[3]),
            method="nearest",
        )
        if occ.shape[1:3] != x.shape[1:3]:
            occ = resize_bilinear(occ, x.shape[1:3], align_corners=False)
        h = ConvRelu(self.feat_dim, name="init_conv_0")(
            jnp.concatenate([occ, x], axis=-1)
        )
        res1 = ConvRelu(self.feat_dim, name="res_convs_0")
        res2 = conv2d(self.feat_dim, 3, 1, name="res_convs_1_0")
        r = h
        for _ in range(3):
            r = r + res2(res1(r)) * 0.1
        h = h + ConvRelu(self.feat_dim, name="res_end_conv_0")(r)
        return ConvRelu(1, name="out_convs_0")(h) + occ


class IRRPWCOcc(nn.Module):
    """IRR-PWC with bi-directional flow + occlusion decoding (reference
    ``model/IRRPWC/IRR_PWC.py:14-198``): per level, forward AND backward
    flow/occlusion are estimated with SHARED estimators, refined by
    kernel-prediction modules on warped-image differences, and the occlusion
    maps are shuffle-upsampled through the remaining fine levels.

    Returned contract: maps = (occ_f, occ_b) at the finest refined level;
    preds = forward-flow predictions coarse→fine (full-res, ÷div_flow).
    Deviation (documented): the reference's final upsample level feeds the
    5-channel raw input where an 11-channel occ-upsample input is required —
    a latent crash in its dead code (IRR_PWC.py:171-186); we apply the 1×1
    reducer at every post-output level instead."""

    n_first_channels: int = 5
    div_flow: float = 0.05
    search_range: int = 4
    output_level: int = 4

    @nn.compact
    def __call__(self, events1, events2, train: bool = False):
        B, H, W, _ = events1.shape
        num_chs = (self.n_first_channels, 16, 32, 64, 96, 128, 196)
        fe = FeatureExtractor(num_chs, name="feature_pyramid_extractor")
        x1_pyr = fe(events1) + [events1]
        x2_pyr = fe(events2) + [events2]

        estimator = FlowEstimatorDense(2, name="flow_estimators")
        context = ContextNetwork(2, name="context_networks")
        occ_estimator = FlowEstimatorDense(1, name="occ_estimators")
        occ_context = ContextNetwork(1, name="occ_context_networks")
        occ_upsample = OccUpsampleNetwork(name="occ_shuffle_upsample")
        refine_flow = RefineFlow(name="refine_flow")
        refine_occ = RefineOcc(name="refine_occ")
        conv1x1 = [
            ConvRelu(32, kernel_size=1, padding=0, name=f"conv_1x1_{l}")
            for l in range(4)
        ]
        # one reducer per post-output level: the reference shares conv_1x1_1
        # across levels with different input widths (16 then raw 5) — a
        # latent shape crash in its dead code; we give each level its own
        conv1x1_fines = [
            ConvRelu(3, kernel_size=1, padding=0, name=f"conv_1x1_fine_{i}")
            # pyramid has len(num_chs)-1 conv levels + the raw input
            for i in range(len(num_chs) - self.output_level - 1)
        ]

        h0, w0 = x1_pyr[0].shape[1:3]
        flow_f = jnp.zeros((B, h0, w0, 2), events1.dtype)
        flow_b = jnp.zeros_like(flow_f)
        occ_f = jnp.zeros((B, h0, w0, 1), events1.dtype)
        occ_b = jnp.zeros_like(occ_f)

        preds = []
        for l, (x1, x2) in enumerate(zip(x1_pyr, x2_pyr)):
            if l <= self.output_level:
                if l > 0:
                    flow_f = resize_bilinear(flow_f, x1.shape[1:3], align_corners=True)
                    flow_b = resize_bilinear(flow_b, x2.shape[1:3], align_corners=True)
                    occ_f = resize_bilinear(occ_f, x1.shape[1:3], align_corners=True)
                    occ_b = resize_bilinear(occ_b, x2.shape[1:3], align_corners=True)
                    x2_warp = pwc_warp(x2, flow_f, H, W, self.div_flow)
                    x1_warp = pwc_warp(x1, flow_b, H, W, self.div_flow)
                else:
                    x2_warp, x1_warp = x2, x1

                corr_f = leaky_relu01(local_correlation(x1, x2_warp, self.search_range))
                corr_b = leaky_relu01(local_correlation(x2, x1_warp, self.search_range))

                x1_1 = conv1x1[l](x1) if l < len(conv1x1) else x1
                x2_1 = conv1x1[l](x2) if l < len(conv1x1) else x2

                flow_f = rescale_flow(flow_f, self.div_flow, W, H, to_local=True)
                flow_b = rescale_flow(flow_b, self.div_flow, W, H, to_local=True)

                xi_f, res_f = estimator(jnp.concatenate([corr_f, x1_1, flow_f], -1))
                xi_b, res_b = estimator(jnp.concatenate([corr_b, x2_1, flow_b], -1))
                flow_est_f = flow_f + res_f
                flow_est_b = flow_b + res_b
                flow_cont_f = flow_est_f + context(
                    jnp.concatenate([xi_f, flow_est_f], -1)
                )
                flow_cont_b = flow_est_b + context(
                    jnp.concatenate([xi_b, flow_est_b], -1)
                )

                xo_f, ores_f = occ_estimator(jnp.concatenate([corr_f, x1_1, occ_f], -1))
                xo_b, ores_b = occ_estimator(jnp.concatenate([corr_b, x2_1, occ_b], -1))
                occ_est_f = occ_f + ores_f
                occ_est_b = occ_b + ores_b
                occ_cont_f = occ_est_f + occ_context(
                    jnp.concatenate([xo_f, occ_est_f], -1)
                )
                occ_cont_b = occ_est_b + occ_context(
                    jnp.concatenate([xo_b, occ_est_b], -1)
                )

                # kernel refinement on warped-image differences
                img1_r = resize_bilinear(events1, flow_f.shape[1:3], align_corners=True)
                img2_r = resize_bilinear(events2, flow_b.shape[1:3], align_corners=True)
                fl_cont_f_g = rescale_flow(flow_cont_f, self.div_flow, W, H, False)
                fl_cont_b_g = rescale_flow(flow_cont_b, self.div_flow, W, H, False)
                img2_warp = pwc_warp(img2_r, fl_cont_f_g, H, W, self.div_flow)
                img1_warp = pwc_warp(img1_r, fl_cont_b_g, H, W, self.div_flow)

                flow_f = refine_flow(
                    jax.lax.stop_gradient(flow_cont_f), img1_r - img2_warp, x1_1
                )
                flow_b = refine_flow(
                    jax.lax.stop_gradient(flow_cont_b), img2_r - img1_warp, x2_1
                )
                flow_f = rescale_flow(flow_f, self.div_flow, W, H, to_local=False)
                flow_b = rescale_flow(flow_b, self.div_flow, W, H, to_local=False)

                x2_1_warp = pwc_warp(x2_1, flow_f, H, W, self.div_flow)
                x1_1_warp = pwc_warp(x1_1, flow_b, H, W, self.div_flow)
                occ_f = refine_occ(
                    jax.lax.stop_gradient(occ_cont_f), x1_1, x1_1 - x2_1_warp
                )
                occ_b = refine_occ(
                    jax.lax.stop_gradient(occ_cont_b), x2_1, x2_1 - x1_1_warp
                )

                preds.append(
                    resize_bilinear(flow_f, (H, W), align_corners=True)
                    * (1.0 / self.div_flow)
                )
            else:
                flow_f = resize_bilinear(flow_f, x1.shape[1:3], align_corners=True)
                flow_b = resize_bilinear(flow_b, x2.shape[1:3], align_corners=True)
                preds.append(
                    resize_bilinear(flow_f, (H, W), align_corners=True)
                    * (1.0 / self.div_flow)
                )
                x2_warp = pwc_warp(x2, flow_f, H, W, self.div_flow)
                x1_warp = pwc_warp(x1, flow_b, H, W, self.div_flow)
                flow_b_warp = pwc_warp(flow_b, flow_f, H, W, self.div_flow)
                flow_f_warp = pwc_warp(flow_f, flow_b, H, W, self.div_flow)

                reducer = conv1x1_fines[l - self.output_level - 1]
                x1_in = reducer(x1)
                x2_in = reducer(x2)
                x1_w_in = reducer(x1_warp)
                x2_w_in = reducer(x2_warp)

                occ_f = occ_upsample(
                    occ_f, jnp.concatenate([x1_in, x2_w_in, flow_f, flow_b_warp], -1)
                )
                occ_b = occ_upsample(
                    occ_b, jnp.concatenate([x2_in, x1_w_in, flow_b, flow_f_warp], -1)
                )

        return (occ_f, occ_b), preds


class PWCFamilyNet(nn.Module):
    """The PWC variant family in one module (reference
    ``model/IRRPWC/pwcnet*.py``).  Flags → files:

      * ``irr=False``: per-level FlowEstimatorDense (level 0 sees the bare
        cost volume; deeper levels corr+features+flow), context network at
        the output level only, flow passed between levels un-rescaled —
        ``pwcnet.py:23-99`` (+``_bi``/``_occ``/``_occ_bi``).
      * ``irr=True``: ONE shared estimator + per-level 1×1 feature reducers
        (196/128/96/64/32 → 32), ``rescale_flow`` to local units around the
        estimator, context refinement at every level —
        ``pwcnet_irr_bi.py`` / ``pwcnet_irr_occ.py`` / ``pwcnet_irr_occ_bi.py``.
      * ``bi``: a backward direction through the same estimators.
      * ``occ``: mirrored occlusion estimators (out_ch=1).

    ``__call__(ev1, ev2) → (maps, preds)``: preds = full-res forward flows
    (÷div_flow) coarse→fine; maps = (occ_f, occ_b | None) when ``occ``
    else the raw inputs.  (``pwcnet_irr.py`` itself is ``PWCNet`` above;
    ``IRR_PWC.py`` is ``IRRPWCOcc`` below.)
    """

    n_first_channels: int = 5
    div_flow: float = 0.05
    search_range: int = 4
    output_level: int = 4
    irr: bool = False
    bi: bool = False
    occ: bool = False

    @nn.compact
    def __call__(self, events1, events2, train: bool = False):
        B, H, W, _ = events1.shape
        num_chs = (self.n_first_channels, 16, 32, 64, 96, 128, 196)
        fe = FeatureExtractor(num_chs, name="feature_pyramid_extractor")
        x1_pyr = fe(events1)
        x2_pyr = fe(events2)

        n_lv = self.output_level + 1
        if self.irr:
            flow_est = [FlowEstimatorDense(2, name="flow_estimators")] * n_lv
            contexts = [ContextNetwork(2, name="context_networks")] * n_lv
            conv1x1 = [
                ConvRelu(32, kernel_size=1, padding=0, name=f"conv_1x1_{l}")
                for l in range(n_lv)
            ]
            if self.occ:
                occ_est = [FlowEstimatorDense(1, name="occ_estimators")] * n_lv
                occ_ctx = [ContextNetwork(1, name="occ_context_networks")] * n_lv
        else:
            flow_est = [
                FlowEstimatorDense(2, name=f"flow_estimators_{l}")
                for l in range(n_lv)
            ]
            contexts = [None] * (n_lv - 1) + [
                ContextNetwork(2, name="context_networks")
            ]
            if self.occ:
                occ_est = [
                    FlowEstimatorDense(1, name=f"occ_estimators_{l}")
                    for l in range(n_lv)
                ]
                occ_ctx = [None] * (n_lv - 1) + [
                    ContextNetwork(1, name="context_networks_occ")
                ]

        def zeros(ch):
            return jnp.zeros(x1_pyr[0].shape[:3] + (ch,), events1.dtype)

        flow_f, flow_b = zeros(2), zeros(2)
        occ_f, occ_b = zeros(1), zeros(1)
        preds = []
        for l, (x1, x2) in enumerate(zip(x1_pyr, x2_pyr)):
            if l == 0:
                x2_warp, x1_warp = x2, x1
            else:
                flow_f = resize_bilinear(flow_f, x1.shape[1:3], align_corners=True)
                x2_warp = pwc_warp(x2, flow_f, H, W, self.div_flow)
                if self.occ:
                    occ_f = resize_bilinear(occ_f, x1.shape[1:3], align_corners=True)
                if self.bi:
                    flow_b = resize_bilinear(flow_b, x2.shape[1:3], align_corners=True)
                    x1_warp = pwc_warp(x1, flow_b, H, W, self.div_flow)
                    if self.occ:
                        occ_b = resize_bilinear(
                            occ_b, x2.shape[1:3], align_corners=True
                        )

            corr_f = leaky_relu01(local_correlation(x1, x2_warp, self.search_range))
            if self.bi:
                corr_b = leaky_relu01(
                    local_correlation(x2, x1_warp, self.search_range)
                )

            if self.irr:
                flow_f = rescale_flow(flow_f, self.div_flow, W, H, to_local=True)
                x1_in = conv1x1[l](x1)
                if self.bi:
                    flow_b = rescale_flow(flow_b, self.div_flow, W, H, to_local=True)
                    x2_in = conv1x1[l](x2)
            else:
                x1_in, x2_in = x1, x2

            def run_arm(est, ctx, corr, feat, prev, use_feat):
                x_in = corr if not use_feat else jnp.concatenate(
                    [corr, feat, prev], axis=-1
                )
                x_intm, out = est(x_in)
                # Only the irr variants are residual (pwcnet_irr_bi.py:85-87);
                # the non-irr variants REPLACE the field with the estimator
                # output at every level, even though the previous field is fed
                # as input (pwcnet.py:78-82, pwcnet_bi.py:84-88,
                # pwcnet_occ_bi.py:94-104).
                new = prev + out if self.irr else out
                if ctx is not None:
                    new = new + ctx(jnp.concatenate([x_intm, new], axis=-1))
                return new

            use_feat = self.irr or l > 0
            flow_f = run_arm(flow_est[l], contexts[l], corr_f, x1_in, flow_f, use_feat)
            if self.bi:
                flow_b = run_arm(
                    flow_est[l], contexts[l], corr_b, x2_in, flow_b, use_feat
                )
            if self.occ:
                occ_f = run_arm(occ_est[l], occ_ctx[l], corr_f, x1_in, occ_f, use_feat)
                if self.bi:
                    # reference quirk: the NON-irr occ_bi variant feeds x1
                    # (not x2) to the backward occlusion estimator
                    # (pwcnet_occ_bi.py:103); the irr variant uses x2_1by1
                    # correctly (pwcnet_irr_occ_bi.py:113)
                    occ_feat_b = x2_in if self.irr else x1_in
                    occ_b = run_arm(
                        occ_est[l], occ_ctx[l], corr_b, occ_feat_b, occ_b, use_feat
                    )

            if self.irr:
                flow_f = rescale_flow(flow_f, self.div_flow, W, H, to_local=False)
                if self.bi:
                    flow_b = rescale_flow(flow_b, self.div_flow, W, H, to_local=False)

            preds.append(
                resize_bilinear(flow_f, (H, W), align_corners=True)
                * (1.0 / self.div_flow)
            )
            if l == self.output_level:
                break

        if self.occ:
            maps = (
                resize_bilinear(occ_f, (H, W), align_corners=True),
                resize_bilinear(occ_b, (H, W), align_corners=True)
                if self.bi
                else None,
            )
        else:
            maps = (events1, events2)
        return maps, preds


class UnitePWCNet(nn.Module):
    """unite_pwcnet_irr (reference ``model/IRRPWC/unite_pwcnet_irr.py``):
    MIMO-UNet(-little) event-density enhancement of both volumes, selective
    -kernel fusion with the raw volumes, then the IRR-PWC flow path.
    maps = the multi-scale enhanced volumes (finest = the SK-fused pair,
    reference :61-62,112-118); preds = IRR-PWC full-res flows."""

    n_first_channels: int = 5
    div_flow: float = 0.05

    @nn.compact
    def __call__(self, events1, events2, train: bool = False):
        from eemflow_tpu.models.sknet import SKFuse
        from eemflow_tpu.models.unet import MIMOUNet
        from eemflow_tpu.ops.pad import InputPadder

        B, H, W, _ = events1.shape
        # the MIMO frontend downsamples /4: pad bottom/right like UniteZoo so
        # inputs not divisible by 4 don't crash in the UNet skip concats, and
        # coarse maps unpad by exact prefix crops
        padder = InputPadder((H, W), mode="downscale", eval_pad_rate=8)
        im1, im2 = padder.pad(events1, events2)

        # reference uses MIMOUNet_little (module missing upstream); 'little'
        # is the half-width base=8 setting, matching UniteZoo
        unet = MIMOUNet(out_ch=self.n_first_channels, base=8, name="unet")
        outs1 = unet(im1, with_res=False, train=train)
        outs2 = unet(im2, with_res=False, train=train)
        sk = SKFuse(name="unet_sk")
        x1 = padder.unpad(sk(im1, outs1[-1]))
        x2 = padder.unpad(sk(im2, outs2[-1]))

        _, preds = PWCNet(
            self.n_first_channels, self.div_flow, name="pwc"
        )(x1, x2, train=train)
        maps = []
        for o1, o2 in zip(outs1, outs2):
            s = im1.shape[1] // o1.shape[1]
            maps.append((o1[:, : H // s, : W // s], o2[:, : H // s, : W // s]))
        maps[-1] = (x1, x2)
        return maps, preds
