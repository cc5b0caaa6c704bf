"""FlowFormer — latent cost tokens + recurrent transformer decoder
(reference ``model/flowformer/FlowFormer/LatentCostFormer/``: transformer.py,
encoder.py, decoder.py, attention.py, twins.py; event config via
``model/flowformer/config.py`` — fnet/cnet are 'basicencoder', so the Twins
backbone path is not exercised by the shipped configs).

Pipeline:
  1. instance-norm RAFT encoders for features and context (256-d, /8),
  2. all-pairs cost volume, viewed per source pixel as an H2×W2 cost map,
  3. **CostPerceiverEncoder**: each cost map is patch-embedded (3×(k6,s2)
     convs → /8, linear sine position encoding fused by a 1×1 FFN), then a
     set of K=8 latent tokens (128-d) cross-attends to it; ``encoder_depth``
     rounds of [per-pixel self-attention across the K tokens + "vertical"
     attention across source pixels per token (local 7×7-window + global
     4×-subsampled, context-conditioned q/k)], with a residual shortcut,
  4. **MemoryDecoder**: 12 recurrent steps — sample a 9×9 cost patch at
     coords1, encode it to a flow token, cross-attend to the latent cost
     memory (flow-position encoded queries), concatenate global+local cost
     features, GMA update block + convex upsampling.

Faithful-in-structure simplifications (documented): the Twins blocks'
conv-based relative position encoding is a depthwise 3×3 PosConv; drop-path
is identity (eval-parity irrelevant at rate 0 in the shipped config).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.eraft import coords_grid
from eemflow_tpu.models.gma import GMAAggregate, GMAAttention
from eemflow_tpu.models.layers import conv2d
from eemflow_tpu.models.raft_core import BasicEncoder, BasicMotionEncoder, FlowHead, SepConvGRU
from eemflow_tpu.ops.pad import InputPadder
from eemflow_tpu.ops.upsample import convex_upsample_flow
from eemflow_tpu.ops.warp import _gather_bilinear

HI = jax.lax.Precision.HIGHEST


def linear_position_embedding_sine(coord, dim, normalize_factor=1.0 / 200):
    """reference attention.py:150-154. coord: [..., 2] → [..., dim]."""
    freq = jnp.arange(dim // 4, dtype=jnp.float32)
    x = coord[..., -2:-1] * 3.14 * normalize_factor
    y = coord[..., -1:] * 3.14 * normalize_factor
    return jnp.concatenate(
        [jnp.sin(x * freq), jnp.cos(x * freq), jnp.sin(y * freq), jnp.cos(y * freq)],
        axis=-1,
    )


class MHA(nn.Module):
    num_heads: int = 8

    @nn.compact
    def __call__(self, q, k, v):
        # q/k/v: [B, Lq/Lk, D] already projected
        B, Lq, D = q.shape
        hd = D // self.num_heads

        def sh(t):
            return t.reshape(t.shape[0], t.shape[1], self.num_heads, hd)

        scores = jnp.einsum("bqhd,bkhd->bhqk", sh(q), sh(k), precision=HI) * (
            hd**-0.5
        )
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", jax.nn.softmax(scores, -1), sh(v), precision=HI
        )
        return out.reshape(B, Lq, D)


class PatchEmbedCost(nn.Module):
    """Cost-map patch embedding (reference encoder.py:25-82, patch_size=8)."""

    embed_dim: int = 64

    @nn.compact
    def __call__(self, cost_maps):
        """cost_maps: [N, H2, W2, heads] → tokens [N, H3*W3, 2*embed], (H3, W3)."""
        d = self.embed_dim
        x = cost_maps
        pad_b = (8 - x.shape[1] % 8) % 8
        pad_r = (8 - x.shape[2] % 8) % 8
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = nn.relu(conv2d(d // 4, 6, 2, 2, name="proj_0")(x))
        x = nn.relu(conv2d(d // 2, 6, 2, 2, name="proj_2")(x))
        x = conv2d(d, 6, 2, 2, name="proj_4")(x)
        N, H3, W3, _ = x.shape

        coords = coords_grid(1, H3, W3) * 8 + 4  # feature-space patch centers
        pe = linear_position_embedding_sine(coords.reshape(1, H3, W3, 2), d)
        x = jnp.concatenate([x, jnp.broadcast_to(pe, (N, H3, W3, d))], axis=-1)
        x = conv2d(2 * d, 1, 1, 0, name="ffn_0")(x)
        x = conv2d(2 * d, 1, 1, 0, name="ffn_2")(nn.relu(x))
        x = nn.LayerNorm(name="norm")(x.reshape(N, H3 * W3, 2 * d))
        return x, (H3, W3)


class CrossAttentionLayer(nn.Module):
    """Latent/query cross-attention with pre-norm + FFN
    (reference decoder.py:29-92 / encoder.py input layer)."""

    qk_dim: int
    query_dim: int

    @nn.compact
    def __call__(self, query, key, value, pos_enc=None):
        short = query
        x = nn.LayerNorm(name="norm1")(query)
        q_in = x + pos_enc if pos_enc is not None else x
        q = nn.Dense(self.qk_dim, name="q")(q_in)
        out = MHA(8, name="attn")(q, key, value)
        out = nn.Dense(self.query_dim, name="proj")(
            jnp.concatenate([out, short], axis=-1)
        )
        x = short + out
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.query_dim, name="ffn_0")(y)
        y = nn.Dense(self.query_dim, name="ffn_3")(nn.gelu(y, approximate=False))
        return x + y


class TokenSelfAttention(nn.Module):
    """Self-attention across the K latent tokens of one source pixel
    (reference encoder.py SelfAttentionLayer)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        short = x
        y = nn.LayerNorm(name="norm1")(x)
        q = nn.Dense(self.dim, name="q")(y)
        k = nn.Dense(self.dim, name="k")(y)
        v = nn.Dense(self.dim, name="v")(y)
        out = MHA(8, name="attn")(q, k, v)
        x = short + nn.Dense(self.dim, name="proj")(out)
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.dim, name="ffn_0")(y)
        y = nn.Dense(self.dim, name="ffn_3")(nn.gelu(y, approximate=False))
        return x + y


class VerticalAttention(nn.Module):
    """Attention across source pixels per latent token: local 7×7 window +
    global 4×-subsampled, with context-conditioned q/k (reference
    encoder.py VerticalSelfAttentionLayer + twins.py Blocks)."""

    dim: int
    vert_c_dim: int = 64
    ws: int = 7
    sr_ratio: int = 4

    @nn.compact
    def __call__(self, x, size, context):
        """x: [BK, H1*W1, D]; context: [B, H1, W1, 256] or None."""
        H1, W1 = size
        BK = x.shape[0]
        xm = x.reshape(BK, H1, W1, self.dim)
        # conv relative-position encoding (PosConv/PEG-style)
        xm = xm + conv2d(self.dim, 3, 1, 1, groups=self.dim, name="pos_conv")(xm)

        if context is not None:
            B = context.shape[0]
            K = BK // B
            c = nn.Dense(self.vert_c_dim, name="context_proj")(context)
            c = jnp.repeat(c[:, None], K, axis=1).reshape(BK, H1, W1, self.vert_c_dim)
            qk_in = jnp.concatenate([xm, c], axis=-1)
        else:
            qk_in = xm

        # local windowed attention
        short = xm
        y = nn.LayerNorm(name="norm1")(qk_in)
        ws = self.ws
        pad_b = (ws - H1 % ws) % ws
        pad_r = (ws - W1 % ws) % ws
        yp = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        vp = jnp.pad(xm, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H1 + pad_b, W1 + pad_r
        hs, wsn = Hp // ws, Wp // ws

        def windows(t):
            C = t.shape[-1]
            t = t.reshape(BK, hs, ws, wsn, ws, C).transpose(0, 1, 3, 2, 4, 5)
            return t.reshape(BK * hs * wsn, ws * ws, C)

        q = nn.Dense(self.dim, name="local_q")(windows(yp))
        k = nn.Dense(self.dim, name="local_k")(windows(yp))
        v = nn.Dense(self.dim, name="local_v")(windows(vp))
        o = MHA(8, name="local_attn")(q, k, v)
        o = o.reshape(BK, hs, wsn, ws, ws, self.dim).transpose(0, 1, 3, 2, 4, 5)
        o = o.reshape(BK, Hp, Wp, self.dim)[:, :H1, :W1, :]
        xm = short + nn.Dense(self.dim, name="local_proj")(o)

        # global subsampled attention
        short = xm
        if context is not None:
            qk_in = jnp.concatenate([xm, c], axis=-1)
        else:
            qk_in = xm
        y = nn.LayerNorm(name="norm2")(qk_in)
        q = nn.Dense(self.dim, name="global_q")(y.reshape(BK, H1 * W1, -1))
        sr = self.sr_ratio
        pad_b = (sr - H1 % sr) % sr
        pad_r = (sr - W1 % sr) % sr
        ysub = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        vsub = jnp.pad(xm, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hs, Ws = (H1 + pad_b) // sr, (W1 + pad_r) // sr
        ysub = nn.avg_pool(ysub, (sr, sr), strides=(sr, sr)).reshape(BK, Hs * Ws, -1)
        vsub = nn.avg_pool(vsub, (sr, sr), strides=(sr, sr)).reshape(BK, Hs * Ws, -1)
        k = nn.Dense(self.dim, name="global_k")(ysub)
        v = nn.Dense(self.dim, name="global_v")(vsub)
        o = MHA(8, name="global_attn")(q, k, v).reshape(BK, H1, W1, self.dim)
        xm = short + nn.Dense(self.dim, name="global_proj")(o)

        # MLP
        y = nn.LayerNorm(name="norm3")(xm)
        y = nn.Dense(4 * self.dim, name="mlp_fc1")(y)
        y = nn.Dense(self.dim, name="mlp_fc2")(nn.gelu(y, approximate=False))
        xm = xm + y
        return xm.reshape(BK, H1 * W1, self.dim)


class FlowFormer(nn.Module):
    """__call__(ev1, ev2 [B,H,W,bins]) → ((ev1, ev2), flows
    [depth, B, H, W, 2])."""

    n_first_channels: int = 5
    encoder_latent_dim: int = 256
    cost_latent_input_dim: int = 64
    cost_latent_token_num: int = 8
    cost_latent_dim: int = 128
    query_latent_dim: int = 64
    encoder_depth: int = 3
    decoder_depth: int = 12
    pad_rate: int = 32

    @nn.compact
    def __call__(self, events1, events2, train: bool = False):
        B, H, W, _ = events1.shape
        padder = InputPadder((H, W), mode="chairs", eval_pad_rate=self.pad_rate)
        im1, im2 = padder.pad(events1, events2)

        context = BasicEncoder(
            256, "instance", self.n_first_channels, name="context_encoder"
        )(im1)

        # ---- memory encoder
        fenc = BasicEncoder(
            256, "instance", self.n_first_channels, name="feat_encoder"
        )
        f1 = fenc(im1)
        f2 = fenc(im2)
        conv1x1 = conv2d(
            self.encoder_latent_dim, 1, 1, 0, use_bias=False, name="channel_convertor"
        )
        f1 = conv1x1(f1)
        f2 = conv1x1(f2)
        H1, W1 = f1.shape[1:3]
        corr = jnp.einsum(
            "bxyc,buvc->bxyuv",
            f1,
            f2,
            precision=HI,
        )  # [B, H1, W1, H2, W2] (heads=1; no √C scaling, encoder.py:328-337)
        cost_maps = corr.reshape(B * H1 * W1, H1, W1, 1)

        tokens, (H3, W3) = PatchEmbedCost(
            self.cost_latent_input_dim, name="patch_embed"
        )(cost_maps)

        latent = self.param(
            "latent_tokens",
            nn.initializers.normal(1.0),
            (1, self.cost_latent_token_num, self.cost_latent_dim),
        )
        latent = jnp.broadcast_to(
            latent, (B * H1 * W1, self.cost_latent_token_num, self.cost_latent_dim)
        )
        key0 = nn.Dense(self.cost_latent_dim, name="input_k")(tokens)
        val0 = nn.Dense(self.cost_latent_dim, name="input_v")(tokens)
        x = CrossAttentionLayer(
            self.cost_latent_dim, self.cost_latent_dim, name="input_layer"
        )(latent, key0, val0)

        short_cut = x
        K = self.cost_latent_token_num
        D = self.cost_latent_dim
        for i in range(self.encoder_depth):
            x = TokenSelfAttention(D, name=f"encoder_layers_{i}")(x)
            xv = x.reshape(B, H1 * W1, K, D).transpose(0, 2, 1, 3).reshape(
                B * K, H1 * W1, D
            )
            xv = VerticalAttention(D, name=f"vertical_encoder_layers_{i}")(
                xv, (H1, W1), context
            )
            x = xv.reshape(B, K, H1 * W1, D).transpose(0, 2, 1, 3).reshape(
                B * H1 * W1, K, D
            )
        cost_memory = x + short_cut  # cost_encoder_res=True

        # ---- memory decoder
        ctx = conv2d(256, 1, 1, 0, name="proj")(context)
        net = nn.tanh(ctx[..., :128])
        inp = nn.relu(ctx[..., 128:])
        attention = GMAAttention(128, name="att")(inp)

        coords0 = coords_grid(B, H1, W1)
        coords1 = coords0

        mem_k = nn.Dense(self.query_latent_dim, name="mem_k")(cost_memory)
        mem_v = nn.Dense(self.query_latent_dim, name="mem_v")(cost_memory)

        flow_token_enc_0 = conv2d(self.query_latent_dim, 1, 1, 0, name="flow_token_encoder_0")
        flow_token_enc_2 = conv2d(self.query_latent_dim, 1, 1, 0, name="flow_token_encoder_2")
        decoder_layer = CrossAttentionLayer(
            self.query_latent_dim, self.query_latent_dim, name="decoder_layer"
        )

        # GMA update block over [cost_global(64) + cost_forward(81)] channels
        class FFUpdate(nn.Module):
            @nn.compact
            def __call__(self, net, inp, corr_feat, flow, attention):
                motion = BasicMotionEncoder(name="encoder")(flow, corr_feat)
                motion_g = GMAAggregate(128, name="aggregator")(attention, motion)
                gi = jnp.concatenate([inp, motion, motion_g], axis=-1)
                net = SepConvGRU(128, name="gru")(net, gi)
                delta = FlowHead(256, name="flow_head")(net)
                mask = conv2d(256, 3, 1, 1, name="mask_0")(net)
                mask = conv2d(64 * 9, 1, 1, 0, name="mask_2")(nn.relu(mask))
                return net, 0.25 * mask, delta

        update_block = FFUpdate(name="update_block")

        r = 4
        offs = jnp.arange(-r, r + 1, dtype=jnp.float32)

        flows = []
        for _ in range(self.decoder_depth):
            coords1 = jax.lax.stop_gradient(coords1)
            # sample 9×9 cost patch at coords1 (x-major window, like CorrBlock)
            cx = coords1[..., 0].reshape(B * H1 * W1)
            cy = coords1[..., 1].reshape(B * H1 * W1)
            px = jnp.broadcast_to(
                cx[:, None, None] + offs[None, :, None], (B * H1 * W1, 9, 9)
            )
            py = jnp.broadcast_to(
                cy[:, None, None] + offs[None, None, :], (B * H1 * W1, 9, 9)
            )
            cost_forward = _gather_bilinear(cost_maps, px, py).reshape(
                B, H1, W1, 81
            )

            q = flow_token_enc_2(
                nn.gelu(flow_token_enc_0(cost_forward), approximate=False)
            )
            q = q.reshape(B * H1 * W1, 1, self.query_latent_dim)
            pos = linear_position_embedding_sine(
                coords1.reshape(B * H1 * W1, 1, 2), self.query_latent_dim
            )
            cost_global = decoder_layer(q, mem_k, mem_v, pos_enc=pos).reshape(
                B, H1, W1, self.query_latent_dim
            )
            corr_feat = jnp.concatenate([cost_global, cost_forward], axis=-1)

            flow = coords1 - coords0
            net, up_mask, delta = update_block(net, inp, corr_feat, flow, attention)
            coords1 = coords1 + delta
            flows.append(
                padder.unpad(convex_upsample_flow(coords1 - coords0, up_mask))
            )

        return (events1, events2), jnp.stack(flows, axis=0)
