"""EEMFlow+ ("EEMFlow_cdc") — coarse-to-fine variant with self-guided
content-aware flow upsampling (reference ``model/EEMFlow/EEMFlow+.py:74-234``
+ ``model/EEMFlow/cdc_utils.py``).

Six-level pyramid (3 stride-2 convs + 3 average pools); at each level from
coarse to fine: upsample the previous flow with the UPFlow-style SGU
(``cdc_model``: warp guide features, predict inter-flow + blend mask,
refine the bilinear-upsampled flow via backwarp blending), warp the
second-view features (align_corners=True), 53-channel sparsified local
correlation, grouped-conv decoder residual.  Returns 5 predictions
(coarse→fine), each upsampled to input size with magnitude rescaling.

Dead reference params (deconv up3-6, conv_1x1[0:2], the SGU's
``upsample_output_conv``) are never called in the forward and are not
created here; the checkpoint converter drops them (``EEMFLOW_PLUS_DROP``).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.eemflow import INDEX_53, Decoder, Pyramid
from eemflow_tpu.models.layers import ConvRelu, conv2d
from eemflow_tpu.ops.correlation import local_correlation
from eemflow_tpu.ops.pad import InputPadder
from eemflow_tpu.ops.pooling import avg_pool2d
from eemflow_tpu.ops.upsample import upsample2d_flow_as
from eemflow_tpu.ops.warp import backwarp, backwarp_masked, warp_align_corners

# torch checkpoint keys with no live forward path (see module docstring)
EEMFLOW_PLUS_DROP = ("up3", "up4", "up5", "up6", "conv_1x1.0", "conv_1x1.1",
                     "cdc_model.upsample_output_conv")


class FlowEstimatorDense(nn.Module):
    """Densely-connected 5-conv estimator + linear head
    (reference ``cdc_utils.py:109-145``)."""

    f_channels: Sequence[int] = (32, 32, 32, 16, 8)
    ch_out: int = 3

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.f_channels):
            y = ConvRelu(f, name=f"conv{i + 1}")(x)
            x = jnp.concatenate([y, x], axis=-1)
        out = conv2d(self.ch_out, 3, 1, name="conv_last_0")(x)
        return x, out


class CDCModel(nn.Module):
    """Self-guided upsampling module (reference ``cdc_utils.py:105-174``).

    ``fast=True`` (serving, eval-only, same params): the densely-connected
    estimator runs as one banded fused Pallas chain
    (``fused_convs_pool(concat=...)``) instead of 6 separate convs; grids
    shorter than the 6-row conv halo fall back to the standard modules."""

    fast: bool = False
    fast_dtype: str = "float32"

    def _fast_estimator(self, feat):
        from eemflow_tpu.ops.pallas.fused_convs import fused_convs_pool

        Hl = feat.shape[1]
        n = 6
        if Hl < n or self.is_initializing():
            return None
        de = self.variables["params"]["dense_estimator_mask"]
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        ks = [f32(de[f"conv{i}"]["0"]["kernel"]) for i in range(1, 6)]
        bs = [f32(de[f"conv{i}"]["0"]["bias"]) for i in range(1, 6)]
        ks.append(f32(de["conv_last_0"]["kernel"]))
        bs.append(f32(de["conv_last_0"]["bias"]))
        tr = next((d for d in (8, 12, 16) if Hl % d == 0), Hl)
        cdt = (
            jnp.bfloat16
            if self.fast_dtype in ("bf16", "bfloat16")
            else jnp.float32
        )
        out, _ = fused_convs_pool(
            feat, ks, bs, pool=None, tile_rows=tr, variant="taps",
            relus=(True,) * 5 + (False,), concat=(True,) * 5 + (False,),
            compute_dtype=cdt,
        )
        return out

    @nn.compact
    def __call__(self, flow_init, feature_1, feature_2):
        fh, fw = feature_1.shape[1:3]
        if flow_init.shape[1] != fh or flow_init.shape[2] != fw:
            flow_init = upsample2d_flow_as(flow_init, (fh, fw), if_rate=True)
        feature_2_warp = backwarp_masked(feature_2, flow_init)
        feat = jnp.concatenate([feature_1, feature_2_warp], axis=-1)
        x_out = self._fast_estimator(feat) if self.fast else None
        if x_out is None:
            _, x_out = FlowEstimatorDense(name="dense_estimator_mask")(feat)
        inter_flow = x_out[..., :2]
        inter_mask = nn.sigmoid(x_out[..., 2:3])
        flow_up = backwarp(flow_init, inter_flow) * (1 - inter_mask) + (
            flow_init * inter_mask
        )
        return flow_up


class CFP(nn.Module):
    """Confidence-gated flow propagation (reference ``cdc_utils.py:179-210``).

    Self-attention over the projected guide feature propagates the initial
    flow: ``softmax((proj·C^-0.5) @ projᵀ) @ flow``.  The confidence-mask
    gating that names the module is commented out upstream
    (``cdc_utils.py:192-202``), so the mask input is unused — replicated
    faithfully."""

    @nn.compact
    def __call__(self, feat, flow_init):
        B, H, W, C = feat.shape
        tokens = feat.reshape(B, H * W, C)
        proj = nn.Dense(C, name="self_corr")(tokens)
        attn = jax.nn.softmax(
            (proj * (C ** -0.5)) @ jnp.swapaxes(proj, 1, 2), axis=-1
        )
        flow = flow_init.reshape(B, H * W, 2)
        return (attn @ flow).reshape(B, H, W, 2)


class CDCCFPModel(nn.Module):
    """``cdc_cfp_model`` (reference ``cdc_utils.py:211-288``): the SGU
    variant whose upsample blends the inter-flow-warped flow with a CFP
    attention-propagated flow::

        flow_up = (backwarp(flow, inter_flow) + cfp) · ½ · (1−mask) + flow·mask

    Dead code upstream — no shipped entry point constructs it (only the
    unused ``--cdc_model`` flag in ``EEMFlow+.py:308`` names it) — exposed
    here as ``EEMFlowPlus(cdc_variant="cfp")``.  The torch module's
    ``upsample_output_conv`` has no forward path and is dropped by the
    converter (``EEMFLOW_PLUS_DROP``)."""

    @nn.compact
    def __call__(self, flow_init, feature_1, feature_2):
        fh, fw = feature_1.shape[1:3]
        if flow_init.shape[1] != fh or flow_init.shape[2] != fw:
            flow_init = upsample2d_flow_as(flow_init, (fh, fw), if_rate=True)
        feature_2_warp = backwarp_masked(feature_2, flow_init)
        feat = jnp.concatenate([feature_1, feature_2_warp], axis=-1)
        _, x_out = FlowEstimatorDense(name="dense_estimator_mask")(feat)
        inter_flow = x_out[..., :2]
        inter_mask = nn.sigmoid(x_out[..., 2:3])
        flow_add = CFP(name="cfp")(feature_2, flow_init)
        return (backwarp(flow_init, inter_flow) + flow_add) * 0.5 * (
            1 - inter_mask
        ) + flow_init * inter_mask


class EEMFlowPlus(nn.Module):
    """__call__(ev1, ev2 [B,H,W,bins]) → ((ev1, ev2), [flow6..flow2 upsampled])."""

    groups: int = 3
    n_first_channels: int = 15
    corr_indices: Sequence[int] = INDEX_53
    max_displacement: int = 4
    cdc_variant: str = "sgu"  # "cfp" → CDCCFPModel (see its docstring)
    pad_rate: int = 64
    # serving modes (eval-only, same params/checkpoints; see
    # ops/pallas/{fused_convs,coarse_head}.py): fast_pyramid fuses each
    # level's stride-1 convs, fast_decoders runs every level's 7-conv
    # decoder as one banded Pallas chain (grouped convs dense-ified,
    # shuffles folded into weight perms), fast_sgu runs the shared SGU
    # dense estimator as one concat-chain Pallas pass (sgu variant only).
    # fast_dtype="bf16" casts the matmul operands (fp32 accumulation) —
    # tolerance-tested.
    fast_pyramid: bool = False
    fast_decoders: bool = False
    fast_sgu: bool = False
    fast_dtype: str = "float32"
    # Round-4 graph restructure (exact math — see models/eemflow.py):
    # run the siamese pyramid+pools and each level's conv1x1 pair as one
    # 2B-batch call.  Batch-parallel ops → per-frame results identical.
    siamese_stack: bool = False

    def _fast_on(self, train):
        return not train and not self.is_initializing()

    def _cdt(self):
        return (
            jnp.bfloat16
            if self.fast_dtype in ("bf16", "bfloat16")
            else jnp.float32
        )

    def _fast_pyr(self, ev):
        """Serving pyramid (same params as ``pyramid``): XLA stride-2
        convs + fused stride-1-conv passes; level 3 also emits the first
        pooled grid."""
        from eemflow_tpu.models.layers import leaky_relu01
        from eemflow_tpu.ops.pallas.fused_convs import fused_convs_pool

        pp = self.variables["params"]["pyramid"]

        def s2(x, p):
            w = jnp.asarray(p["0"]["kernel"], x.dtype)
            b = jnp.asarray(p["0"]["bias"], x.dtype)
            y = jax.lax.conv_general_dilated(
                x, w, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return leaky_relu01(y + b)

        def kb(names):
            ks = [pp[n]["0"]["kernel"] for n in names]
            bs = [pp[n]["0"]["bias"] for n in names]
            return ks, bs

        cdt = self._cdt()
        # always tap accumulation: Mosaic cannot lower the im2col X9
        # minor-dim concat at these shapes (measured on v5e; see
        # models/eemflow.py _fast_pyramid)
        var = lambda x: "taps"
        g1 = s2(ev, pp["pconv1_1"])
        f11, _ = fused_convs_pool(g1, *kb(["pconv1_2"]), pool=None,
                                  compute_dtype=cdt, variant=var(g1))
        g2 = s2(f11, pp["pconv2_1"])
        f12, _ = fused_convs_pool(g2, *kb(["pconv2_2", "pconv2_3"]),
                                  pool=None, compute_dtype=cdt,
                                  variant=var(g2))
        g3 = s2(f12, pp["pconv3_1"])
        # tile_rows would default to pool=2 → 2-row tiles with a 2-row
        # halo each side (200% recompute); 8-row tiles emit the same math
        f13, f14 = fused_convs_pool(g3, *kb(["pconv3_2", "pconv3_3"]),
                                    pool=2, tile_rows=8, compute_dtype=cdt,
                                    variant=var(g3))
        return f11, f12, f13, f14

    def _fast_decoder(self, name, x):
        """One banded fused Decoder chain; falls back to None when the
        grid is shorter than the 7-row conv halo (caller keeps the
        standard module path)."""
        from eemflow_tpu.ops.pallas.coarse_head import decoder_dense_kernels
        from eemflow_tpu.ops.pallas.fused_convs import fused_convs_pool

        Hl = x.shape[1]
        n = 7
        if Hl < n:
            return None
        # wide rows (the 720p /4 level is 320 cols): smaller row tiles keep
        # band + taps temporaries inside VMEM; narrow grids prefer larger
        # tiles (less halo recompute)
        cand = (8, 12, 16) if x.shape[2] > 200 else (16, 12, 8)
        tr = next((d for d in cand if Hl % d == 0 and d >= n), Hl)
        ks, bs, relus = decoder_dense_kernels(
            self.variables["params"][name], self.groups
        )
        out, _ = fused_convs_pool(
            x, ks, bs, pool=None, tile_rows=tr, variant="taps",
            relus=relus, compute_dtype=self._cdt(),
        )
        return out

    @nn.compact
    def __call__(self, events1, events2, train: bool = False):
        B, H, W, _ = events1.shape
        padder = InputPadder((H, W), mode="chairs", eval_pad_rate=self.pad_rate)
        im1, im2 = padder.pad(events1, events2)

        if self.fast_pyramid and self._fast_on(train):
            f11, f12, f13, f14 = self._fast_pyr(im1)
            f21, f22, f23, f24 = self._fast_pyr(im2)
        elif self.siamese_stack and not self.is_initializing():
            pyramid = Pyramid(name="pyramid")
            f1s, f2s, f3s = pyramid(jnp.concatenate([im1, im2], axis=0))
            f11, f21 = f1s[:B], f1s[B:]
            f12, f22 = f2s[:B], f2s[B:]
            f4s = avg_pool2d(f3s, 2)
            f13, f23 = f3s[:B], f3s[B:]
            f14, f24 = f4s[:B], f4s[B:]
        else:
            pyramid = Pyramid(name="pyramid")
            f11, f12, f13 = pyramid(im1)
            f21, f22, f23 = pyramid(im2)
            f14, f24 = avg_pool2d(f13, 2), avg_pool2d(f23, 2)
        f15, f25 = avg_pool2d(f14, 2), avg_pool2d(f24, 2)
        f16, f26 = avg_pool2d(f15, 2), avg_pool2d(f25, 2)

        idx = tuple(self.corr_indices)
        md = self.max_displacement
        cdc_cls = CDCModel if self.cdc_variant == "sgu" else CDCCFPModel
        if cdc_cls is CDCModel and self.fast_sgu and self._fast_on(train):
            cdc = CDCModel(name="cdc_model", fast=True,
                           fast_dtype=self.fast_dtype)
        else:
            cdc = cdc_cls(name="cdc_model")

        # conv + LeakyReLU(0.1): the reference builds these with cdc_utils.conv
        # whose isReLU defaults to True (cdc_utils.py:9-30)
        conv1x1 = {
            l: ConvRelu(32, kernel_size=1, padding=0, name=f"conv_1x1_{l}")
            for l in (2, 3, 4, 5)
        }

        def run_decoder(name, x):
            if self.fast_decoders and self._fast_on(train):
                out = self._fast_decoder(name, x)
                if out is not None:
                    return out
            return Decoder(self.groups, mid=96, name=name)(x)

        # level 6 (coarsest)
        flow7_up = jnp.zeros(f16.shape[:3] + (2,), f16.dtype)
        cv6 = local_correlation(f16, f26, md, indices=idx)
        r16 = ConvRelu(32, name="rconv6")(f16)
        flow6 = run_decoder(
            "decoder6", jnp.concatenate([cv6, r16, flow7_up], axis=-1)
        )

        def level(l, f1, f2, flow_coarse, rconv_name, dec_name):
            if self.siamese_stack and not self.is_initializing():
                f12_1x1 = conv1x1[l](jnp.concatenate([f1, f2], axis=0))
                f1_1x1, f2_1x1 = f12_1x1[:B], f12_1x1[B:]
            else:
                f1_1x1 = conv1x1[l](f1)
                f2_1x1 = conv1x1[l](f2)
            flow_up = cdc(flow_coarse, f1_1x1, f2_1x1)
            f2_w = warp_align_corners(f2, flow_up)
            cv = local_correlation(f1, f2_w, md, indices=idx)
            r = ConvRelu(32, name=rconv_name)(f1)
            flow = run_decoder(
                dec_name, jnp.concatenate([cv, r, flow_up], axis=-1)
            )
            return flow + flow_up

        flow5 = level(5, f15, f25, flow6, "rconv5", "decoder5")
        flow4 = level(4, f14, f24, flow5, "rconv4", "decoder4")
        flow3 = level(3, f13, f23, flow4, "rconv3", "decoder3")
        flow2 = level(2, f12, f22, flow3, "rconv2", "decoder2")

        preds = [
            upsample2d_flow_as(f, (H, W), if_rate=True)
            for f in (flow6, flow5, flow4, flow3, flow2)
        ]
        return (events1, events2), preds
