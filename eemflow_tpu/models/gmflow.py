"""GMFlow — global-matching optical flow via feature transformers
(reference ``model/GMflow/``: gmflow.py, transformer.py, matching.py,
backbone.py, position.py, utils.py, trident_conv.py).

Pipeline (shipped event config ``config/m_gmflow.json``: 1 scale, 128-d
features, 6 transformer layers, single head, swin splits=2, global
matching, global propagation):

  1. instance-norm CNN encoder to 1/8 (1/4+1/8 trident for 2 scales),
  2. DETR sine position embedding added per attention window,
  3. 6 × (self-attn + cross-attn+FFN) transformer blocks over both views
     (swin split-window attention with alternating shifted windows),
  4. softmax **global matching**: correspondence = argmax-free expectation
     of the target grid under softmax(corr/√C),
  5. self-attention flow propagation (features as q/k, flow as value),
  6. convex upsampling (9·u² mask) to full resolution.

TPU notes: attention/matching are pure MXU matmuls at 1/8 resolution; the
window partition is a reshape; everything static-shaped.  HIGHEST matmul
precision on matching/attention scores for checkpoint-parity eval.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.layers import InstanceNorm, conv2d, kaiming_out
from eemflow_tpu.ops.pad import InputPadder
from eemflow_tpu.ops.upsample import resize_bilinear
from eemflow_tpu.ops.warp import warp_align_corners

HI = jax.lax.Precision.HIGHEST


def _dense(features, name):
    return nn.Dense(features, use_bias=False, name=name)


class GMResidualBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        y = conv2d(
            self.planes, 3, self.stride, self.dilation, self.dilation,
            use_bias=False, kernel_init=kaiming_out, name="conv1",
        )(x)
        y = nn.relu(InstanceNorm(name="norm1")(y))
        y = conv2d(
            self.planes, 3, 1, self.dilation, self.dilation,
            use_bias=False, kernel_init=kaiming_out, name="conv2",
        )(y)
        y = nn.relu(InstanceNorm(name="norm2")(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = conv2d(self.planes, 1, self.stride, 0, kernel_init=kaiming_out,
                       name="downsample_0")(x)
            x = InstanceNorm(name="norm3")(x)
        return nn.relu(x + y)


class TridentConv(nn.Module):
    """One shared 3×3 kernel applied at strides (1, 2) (reference
    trident_conv.py MultiScaleTridentConv, bias=False); param named
    'kernel' so the torch ``trident_conv.weight`` converts mechanically."""

    features: int
    strides: Sequence[int] = (1, 2)

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", kaiming_out, (3, 3, x.shape[-1], self.features)
        )
        return [
            jax.lax.conv_general_dilated(
                x, kernel, (s, s), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            for s in self.strides
        ]  # high→low resolution


class CNNEncoder(nn.Module):
    """Instance-norm encoder to 1/8 (reference backbone.py:39-110); for
    num_output_scales=2 a shared trident conv emits 1/8 and 1/16 branches."""

    output_dim: int = 128
    num_output_scales: int = 1

    @nn.compact
    def __call__(self, x):
        x = conv2d(64, 7, 2, 3, use_bias=False, kernel_init=kaiming_out, name="conv1")(x)
        x = nn.relu(InstanceNorm(name="norm1")(x))
        x = GMResidualBlock(64, 1, name="layer1_0")(x)
        x = GMResidualBlock(64, 1, name="layer1_1")(x)
        x = GMResidualBlock(96, 2, name="layer2_0")(x)
        x = GMResidualBlock(96, 1, name="layer2_1")(x)
        stride = 2 if self.num_output_scales == 1 else 1
        x = GMResidualBlock(128, stride, name="layer3_0")(x)
        x = GMResidualBlock(128, 1, name="layer3_1")(x)
        x = conv2d(self.output_dim, 1, 1, 0, kernel_init=kaiming_out, name="conv2")(x)

        if self.num_output_scales == 1:
            return [x]
        return TridentConv(self.output_dim, name="trident_conv")(x)


def position_embedding_sine(h, w, num_pos_feats, temperature=10000.0):
    """DETR sine embedding (reference position.py) → [H, W, 2*num_pos_feats]."""
    scale = 2 * math.pi
    eps = 1e-6
    y_embed = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=0)
    x_embed = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=1)
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], -1).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], -1).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def split_windows(x, k):
    """[B, H, W, C] → [B·k·k, H/k, W/k, C] (reference utils.split_feature)."""
    B, H, W, C = x.shape
    x = x.reshape(B, k, H // k, k, W // k, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * k * k, H // k, W // k, C)


def merge_windows(x, k):
    Bk, h, w, C = x.shape
    B = Bk // (k * k)
    x = x.reshape(B, k, k, h, w, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, k * h, k * w, C)


def shift_window_attn_mask(h, w, wh, ww, sh, sw):
    """Swin shifted-window attention mask (reference transformer.py:19-44):
    [K·K, wh·ww, wh·ww] with -100 on cross-region pairs."""
    img = jnp.zeros((1, h, w, 1))
    cnt = 0
    hs = [(0, h - wh), (h - wh, h - sh), (h - sh, h)]
    ws = [(0, w - ww), (w - ww, w - sw), (w - sw, w)]
    for hlo, hhi in hs:
        for wlo, whi in ws:
            img = img.at[:, hlo:hhi, wlo:whi, :].set(cnt)
            cnt += 1
    windows = split_windows(img, h // wh).reshape(-1, wh * ww)
    diff = windows[:, None, :] - windows[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0)


def _attn(q, k, v, mask=None):
    c = q.shape[-1]
    scores = jnp.einsum("blc,bmc->blm", q, k, precision=HI) / (c**0.5)
    if mask is not None:
        scores = scores + mask
    return jnp.einsum("blm,bmc->blc", jax.nn.softmax(scores, -1), v, precision=HI)


class TransformerLayer(nn.Module):
    d_model: int
    no_ffn: bool = False
    ffn_dim_expansion: int = 4
    with_shift: bool = False

    @nn.compact
    def __call__(self, source, target, h, w, num_splits, attn_mask=None):
        q = _dense(self.d_model, "q_proj")(source)
        k = _dense(self.d_model, "k_proj")(target)
        v = _dense(self.d_model, "v_proj")(target)

        B = source.shape[0]
        if num_splits > 1:
            wh, ww = h // num_splits, w // num_splits

            def to_win(t):
                t = t.reshape(B, h, w, self.d_model)
                if self.with_shift:
                    t = jnp.roll(t, (-(wh // 2), -(ww // 2)), axis=(1, 2))
                return split_windows(t, num_splits).reshape(-1, wh * ww, self.d_model)

            mask = attn_mask if self.with_shift else None
            if mask is not None:
                mask = jnp.tile(mask, (B, 1, 1))
            msg = _attn(to_win(q), to_win(k), to_win(v), mask)
            msg = merge_windows(
                msg.reshape(-1, wh, ww, self.d_model), num_splits
            )
            if self.with_shift:
                msg = jnp.roll(msg, (wh // 2, ww // 2), axis=(1, 2))
            msg = msg.reshape(B, h * w, self.d_model)
        else:
            msg = _attn(q, k, v)

        msg = nn.LayerNorm(name="norm1")(_dense(self.d_model, "merge")(msg))
        if not self.no_ffn:
            y = jnp.concatenate([source, msg], axis=-1)
            y = _dense(2 * self.d_model * self.ffn_dim_expansion, "mlp_0")(y)
            y = _dense(self.d_model, "mlp_2")(nn.gelu(y, approximate=False))
            msg = nn.LayerNorm(name="norm2")(y)
        return source + msg


class TransformerBlock(nn.Module):
    d_model: int
    ffn_dim_expansion: int = 4
    with_shift: bool = False

    @nn.compact
    def __call__(self, source, target, h, w, num_splits, attn_mask=None):
        source = TransformerLayer(
            self.d_model, no_ffn=True, ffn_dim_expansion=self.ffn_dim_expansion,
            with_shift=self.with_shift, name="self_attn",
        )(source, source, h, w, num_splits, attn_mask)
        return TransformerLayer(
            self.d_model, ffn_dim_expansion=self.ffn_dim_expansion,
            with_shift=self.with_shift, name="cross_attn_ffn",
        )(source, target, h, w, num_splits, attn_mask)


class FeatureTransformer(nn.Module):
    num_layers: int = 6
    d_model: int = 128
    ffn_dim_expansion: int = 4

    @nn.compact
    def __call__(self, feature0, feature1, num_splits):
        B, H, W, C = feature0.shape
        f0 = feature0.reshape(B, H * W, C)
        f1 = feature1.reshape(B, H * W, C)

        attn_mask = None
        if num_splits > 1:
            wh, ww = H // num_splits, W // num_splits
            attn_mask = shift_window_attn_mask(H, W, wh, ww, wh // 2, ww // 2)

        # both directions concatenated in batch (reference transformer.py:301-315)
        c0 = jnp.concatenate([f0, f1], axis=0)
        c1 = jnp.concatenate([f1, f0], axis=0)
        for i in range(self.num_layers):
            c0 = TransformerBlock(
                self.d_model, self.ffn_dim_expansion,
                with_shift=(i % 2 == 1), name=f"layers_{i}",
            )(c0, c1, H, W, num_splits, attn_mask)
            a, b = jnp.split(c0, 2, axis=0)
            c1 = jnp.concatenate([b, a], axis=0)
        f0, f1 = jnp.split(c0, 2, axis=0)
        return f0.reshape(B, H, W, C), f1.reshape(B, H, W, C)


def global_correlation_softmax(feature0, feature1):
    """Softmax global matching (reference matching.py:8-37)."""
    B, H, W, C = feature0.shape
    corr = jnp.einsum(
        "blc,bmc->blm",
        feature0.reshape(B, H * W, C),
        feature1.reshape(B, H * W, C),
        precision=HI,
    ) / (C**0.5)
    gx = jnp.tile(jnp.arange(W, dtype=jnp.float32)[None, :], (H, 1)).reshape(-1)
    gy = jnp.tile(jnp.arange(H, dtype=jnp.float32)[:, None], (1, W)).reshape(-1)
    grid = jnp.stack([gx, gy], axis=-1)  # [H*W, 2]
    prob = jax.nn.softmax(corr, axis=-1)
    corresp = jnp.einsum("blm,mc->blc", prob, grid, precision=HI)
    flow = corresp.reshape(B, H, W, 2) - grid.reshape(H, W, 2)[None]
    return flow


def local_correlation_softmax(feature0, feature1, radius):
    """Softmax local matching (reference matching.py:40-85)."""
    from eemflow_tpu.ops.correlation import local_correlation

    B, H, W, C = feature0.shape
    k = 2 * radius + 1
    # channel ch = (dy+r)*k + (dx+r); sum (not mean) then /√C
    corr = local_correlation(feature0, feature1, radius) * C / (C**0.5)
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy = jnp.repeat(offs, k)
    dx = jnp.tile(offs, k)
    gx = jnp.arange(W, dtype=jnp.float32)[None, :, None]
    gy = jnp.arange(H, dtype=jnp.float32)[:, None, None]
    sx = gx + dx[None, None, :]
    sy = gy + dy[None, None, :]
    valid = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
    corr = jnp.where(valid[None], corr, -1e9)
    prob = jax.nn.softmax(corr, axis=-1)
    cx = jnp.sum(prob * sx[None], axis=-1)
    cy = jnp.sum(prob * sy[None], axis=-1)
    flow = jnp.stack([cx - gx[..., 0], cy - gy[..., 0]], axis=-1)
    return flow


class FeatureFlowAttention(nn.Module):
    """Flow propagation: features as query/key, flow as value
    (reference transformer.py:325-430; includes the reference's
    q-then-k-of-q projection quirk)."""

    in_channels: int

    @nn.compact
    def __call__(self, feature0, flow, local_window_radius: int = -1):
        B, H, W, C = feature0.shape
        q = nn.Dense(self.in_channels, name="q_proj")(
            feature0.reshape(B, H * W, C)
        )
        k = nn.Dense(self.in_channels, name="k_proj")(q)
        if local_window_radius > 0:
            r = local_window_radius
            ks = 2 * r + 1
            kmap = k.reshape(B, H, W, C)
            vmap = flow
            kpad = jnp.pad(kmap, ((0, 0), (r, r), (r, r), (0, 0)))
            vpad = jnp.pad(vmap, ((0, 0), (r, r), (r, r), (0, 0)))
            kwin = jnp.stack(
                [
                    kpad[:, dy : dy + H, dx : dx + W, :]
                    for dy in range(ks)
                    for dx in range(ks)
                ],
                axis=3,
            )  # [B, H, W, ks², C]
            vwin = jnp.stack(
                [
                    vpad[:, dy : dy + H, dx : dx + W, :]
                    for dy in range(ks)
                    for dx in range(ks)
                ],
                axis=3,
            )  # [B, H, W, ks², 2]
            scores = jnp.einsum(
                "bhwc,bhwkc->bhwk", q.reshape(B, H, W, C), kwin, precision=HI
            ) / (C**0.5)
            prob = jax.nn.softmax(scores, axis=-1)
            return jnp.einsum("bhwk,bhwkc->bhwc", prob, vwin, precision=HI)
        v = flow.reshape(B, H * W, 2)
        out = _attn(q, k, v)
        return out.reshape(B, H, W, 2)


class GMFlow(nn.Module):
    n_first_channels: int = 5
    num_scales: int = 1
    feature_channels: int = 128
    upsample_factor: int = 8
    num_transformer_layers: int = 6
    ffn_dim_expansion: int = 1
    attn_splits_list: Sequence[int] = (2,)
    corr_radius_list: Sequence[int] = (-1,)
    prop_radius_list: Sequence[int] = (-1,)
    pad_rate: int = 32

    @nn.compact
    def __call__(self, events1, events2, train: bool = False):
        B, H, W, _ = events1.shape
        padder = InputPadder((H, W), mode="chairs", eval_pad_rate=self.pad_rate)
        img0, img1 = padder.pad(events1, events2)

        backbone = CNNEncoder(
            self.feature_channels, self.num_scales, name="backbone"
        )
        f0_list = backbone(img0)[::-1]  # low→high resolution
        f1_list = backbone(img1)[::-1]

        transformer = FeatureTransformer(
            self.num_transformer_layers, self.feature_channels,
            self.ffn_dim_expansion, name="transformer",
        )
        prop = FeatureFlowAttention(self.feature_channels, name="feature_flow_attn")

        flow = None
        preds = []
        for scale_idx in range(self.num_scales):
            feature0 = f0_list[scale_idx]
            feature1 = f1_list[scale_idx]
            upsample_factor = self.upsample_factor * (
                2 ** (self.num_scales - 1 - scale_idx)
            )
            if scale_idx > 0:
                fh, fw = feature0.shape[1:3]
                flow = resize_bilinear(flow, (fh, fw), align_corners=True) * 2
            if flow is not None:
                flow = jax.lax.stop_gradient(flow)
                # reference geometry.flow_warp → bilinear_sample with
                # align_corners=True, zeros padding (geometry.py:42-67)
                feature1 = warp_align_corners(feature1, flow)

            splits = self.attn_splits_list[scale_idx]
            corr_radius = self.corr_radius_list[scale_idx]
            prop_radius = self.prop_radius_list[scale_idx]

            fh, fw = feature0.shape[1:3]
            if splits > 1:
                pos = merge_windows(
                    jnp.tile(
                        position_embedding_sine(
                            fh // splits, fw // splits, self.feature_channels // 2
                        )[None],
                        (splits * splits, 1, 1, 1),
                    ),
                    splits,
                )
            else:
                pos = position_embedding_sine(fh, fw, self.feature_channels // 2)
            feature0 = feature0 + pos
            feature1 = feature1 + pos

            feature0, feature1 = transformer(feature0, feature1, splits)

            if corr_radius == -1:
                flow_pred = global_correlation_softmax(feature0, feature1)
            else:
                flow_pred = local_correlation_softmax(feature0, feature1, corr_radius)
            flow = flow + flow_pred if flow is not None else flow_pred

            if train:
                preds.append(
                    padder.unpad(
                        resize_bilinear(
                            flow,
                            (img0.shape[1], img0.shape[2]),
                            align_corners=True,
                        )
                        * upsample_factor
                    )
                )

            flow = prop(
                feature0,
                jax.lax.stop_gradient(flow),
                local_window_radius=prop_radius,
            )

            last = scale_idx == self.num_scales - 1
            if train and not last:
                preds.append(
                    padder.unpad(
                        resize_bilinear(
                            flow, (img0.shape[1], img0.shape[2]), align_corners=True
                        )
                        * upsample_factor
                    )
                )
            if last:
                # convex upsampling
                u = self.upsample_factor
                concat = jnp.concatenate([flow, feature0], axis=-1)
                mask = conv2d(256, 3, 1, 1, name="upsampler_0")(concat)
                mask = conv2d(u * u * 9, 1, 1, 0, name="upsampler_2")(nn.relu(mask))
                from eemflow_tpu.ops.upsample import convex_upsample_flow

                # reference mask layout: c = k*u² + iy*u + ix (gmflow.py:76-85)
                flow_up = convex_upsample_flow(flow, mask, factor=u)
                preds.append(padder.unpad(flow_up))

        return (events1, events2), preds
