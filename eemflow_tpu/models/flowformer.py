"""FlowFormer — latent cost tokens + recurrent transformer decoder
(reference ``model/flowformer/FlowFormer/LatentCostFormer/``: transformer.py,
encoder.py, decoder.py, attention.py, twins.py, gru.py, gma.py; event config
via ``model/flowformer/config.py`` — fnet/cnet are 'basicencoder', so the
Twins-SVT backbone path is not exercised by any shipped config).

Pipeline:
  1. instance-norm RAFT encoders for features and context (256-d, /8),
  2. all-pairs cost volume (no √C scaling, encoder.py:328-337), viewed per
     source pixel as an H2×W2 cost map,
  3. **CostPerceiverEncoder** (encoder.py:245-311): each cost map is
     patch-embedded (3×(k6,s2) convs → /8, linear sine position encoding
     fused by a 1×1 FFN), then K=8 latent tokens (128-d) cross-attend to it
     (input_layer, Broad-MHA); ``encoder_depth`` rounds of [per-pixel
     self-attention across the K tokens + "vertical" attention across
     source pixels per token], with a residual shortcut
     (cost_encoder_res=True),
  4. vertical attention = two twins Blocks (encoder.py:112-137): a local
     7×7-window block (LocallyGroupedAttnRPEContext, twins.py:229-303) and
     a global 4×-subsampled block (GlobalSubSampleAttnRPEContext,
     twins.py:306-392), both with linear-sine RPE added to q/k and a
     64-d context projection concatenated to the q/k inputs,
  5. **MemoryDecoder** (decoder.py:151-263): ``decoder_depth`` recurrent
     steps — sample a 9×9 cost patch at coords1, encode it to a flow token,
     cross-attend to the latent cost memory (flow-position encoded queries,
     k/v projected once), concatenate global+local cost features, GMA
     update block + convex upsampling.

The module tree mirrors the torch attribute paths 1:1 (context_encoder /
memory_encoder.cost_perceiver_encoder.* / memory_decoder.*) so reference
checkpoints convert via the generic digit-merge alias; the GMA attention's
registered-but-unused RelPosEmb params (gma.py:7-31, forward only uses the
content branch) are dropped by ``FLOWFORMER_DROP``.

NOTE: the reference's shipped FlowFormer is only constructible with
3-channel input (cnn.py:122 ``input_dim=3``; the HREM entry never passes
``n_first_channels`` — model/flowformer is latently incompatible with the
5-bin voxel configs).  We default to 5 for the event pipeline but accept 3
for reference-checkpoint parity.

TPU notes: attention/matching are MXU matmuls at 1/8 resolution; the
per-pixel cost maps make the memory encoder O((H·W/64)²) — batch stays
small at 720p; everything static-shaped.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.eraft import coords_grid
from eemflow_tpu.models.gma import GMAAggregate, GMAAttention
from eemflow_tpu.models.layers import conv2d
from eemflow_tpu.models.raft_core import (
    BasicEncoder,
    BasicMotionEncoder,
    FlowHead,
    SepConvGRU,
)
from eemflow_tpu.ops.pad import InputPadder
from eemflow_tpu.ops.upsample import convex_upsample_flow
from eemflow_tpu.ops.warp import _gather_bilinear

HI = jax.lax.Precision.HIGHEST

# checkpoint keys with no live forward path: the decoder GMA attention's
# relative position tables (reference gma.py:54, content-only forward)
FLOWFORMER_DROP = ("memory_decoder.att.pos_emb.",)


def linear_position_embedding_sine(coord, dim, normalize_factor=1.0 / 200):
    """reference attention.py:141-145 (the class twins live in
    ``model/flowformer/position_encoding.py``).  coord: [..., 2] (x, y)
    → [..., dim]."""
    freq = jnp.arange(dim // 4, dtype=jnp.float32)
    x = coord[..., -2:-1] * 3.14 * normalize_factor
    y = coord[..., -1:] * 3.14 * normalize_factor
    return jnp.concatenate(
        [jnp.sin(x * freq), jnp.cos(x * freq), jnp.sin(y * freq), jnp.cos(y * freq)],
        axis=-1,
    )


def _mha(q, k, v, num_heads=8):
    """MultiHeadAttention (reference attention.py:36-61): scale is
    (dim/heads)^-0.5 on the FULL q·k dot product."""
    B, Lq, D = q.shape
    hd = D // num_heads
    scale = hd**-0.5

    def sh(t):
        return t.reshape(t.shape[0], t.shape[1], num_heads, hd)

    scores = jnp.einsum("bqhd,bkhd->bhqk", sh(q), sh(k), precision=HI) * scale
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", jax.nn.softmax(scores, -1), sh(v), precision=HI
    )
    return out.reshape(B, Lq, D)


class PatchEmbed(nn.Module):
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
        x = conv2d(2 * d, 1, 1, 0, name="ffn_with_coord_0")(x)
        x = conv2d(2 * d, 1, 1, 0, name="ffn_with_coord_2")(nn.relu(x))
        x = nn.LayerNorm(name="norm")(x.reshape(N, H3 * W3, 2 * d))
        return x, (H3, W3)


class EncoderCrossAttention(nn.Module):
    """Encoder input layer (reference encoder.py:199-247): latent tokens
    cross-attend to cost tokens; proj is on the attention output only
    (unlike the decoder layer's concat-with-shortcut)."""

    dim: int

    @nn.compact
    def __call__(self, query, tgt):
        short = query
        x = nn.LayerNorm(name="norm1")(query)
        q = nn.Dense(self.dim, name="q")(x)
        k = nn.Dense(self.dim, name="k")(tgt)
        v = nn.Dense(self.dim, name="v")(tgt)
        x = short + nn.Dense(self.dim, name="proj")(_mha(q, k, v))
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.dim, name="ffn_0")(y)
        y = nn.Dense(self.dim, name="ffn_3")(nn.gelu(y, approximate=False))
        return x + y


class DecoderCrossAttention(nn.Module):
    """Decoder cross-attention (reference decoder.py:29-93): flow-position
    encoded queries; proj consumes [attn_out, shortcut] concatenated."""

    dim: int

    @nn.compact
    def __call__(self, query, key, value, pos_enc):
        short = query
        x = nn.LayerNorm(name="norm1")(query)
        q = nn.Dense(self.dim, name="q")(x + pos_enc)
        x = nn.Dense(self.dim, name="proj")(
            jnp.concatenate([_mha(q, key, value), short], axis=-1)
        )
        x = short + x
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.dim, name="ffn_0")(y)
        y = nn.Dense(self.dim, name="ffn_3")(nn.gelu(y, approximate=False))
        return x + y


class SelfAttentionLayer(nn.Module):
    """Self-attention across the K latent tokens of one source pixel
    (reference encoder.py:146-196)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        short = x
        y = nn.LayerNorm(name="norm1")(x)
        q = nn.Dense(self.dim, name="q")(y)
        k = nn.Dense(self.dim, name="k")(y)
        v = nn.Dense(self.dim, name="v")(y)
        x = short + nn.Dense(self.dim, name="proj")(_mha(q, k, v))
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.dim, name="ffn_0")(y)
        y = nn.Dense(self.dim, name="ffn_3")(nn.gelu(y, approximate=False))
        return x + y


class LocallyGroupedAttnRPEContext(nn.Module):
    """7×7-window attention with linear-sine RPE on q/k and a context
    projection concatenated to the q/k input (reference twins.py:229-303).
    Input x is already norm1'd by the Block wrapper."""

    dim: int
    vert_c_dim: int = 64
    ws: int = 7
    num_heads: int = 8

    @nn.compact
    def __call__(self, x, size, context):
        H, W = size
        BK = x.shape[0]
        C = self.dim
        C_qk = C + self.vert_c_dim

        B = context.shape[0]
        K = BK // B
        c = nn.Dense(self.vert_c_dim, name="context_proj")(
            context.reshape(B, H * W, -1)
        )
        c = jnp.repeat(c[:, None], K, axis=1).reshape(BK, H, W, self.vert_c_dim)

        xm = x.reshape(BK, H, W, C)
        x_qk = jnp.concatenate([xm, c], axis=-1)

        ws = self.ws
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        xp = jnp.pad(xm, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        qkp = jnp.pad(x_qk, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        nh, nw = Hp // ws, Wp // ws

        def windows(t):
            Ct = t.shape[-1]
            t = t.reshape(BK, nh, ws, nw, ws, Ct).transpose(0, 1, 3, 2, 4, 5)
            return t.reshape(BK * nh * nw, ws * ws, Ct)

        # per-window RPE on q/k (coords_grid is (x, y) order)
        coords = coords_grid(1, ws, ws).reshape(1, ws * ws, 2)
        enc = linear_position_embedding_sine(coords, C_qk)

        q = nn.Dense(C, name="q")(windows(qkp) + enc)
        k = nn.Dense(C, name="k")(windows(qkp) + enc)
        v = nn.Dense(C, name="v")(windows(xp))
        o = _mha(q, k, v, self.num_heads)
        o = o.reshape(BK, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
        o = o.reshape(BK, Hp, Wp, C)[:, :H, :W, :]
        return nn.Dense(C, name="proj")(o.reshape(BK, H * W, C))


class GlobalSubSampleAttnRPEContext(nn.Module):
    """Global attention against 4×-subsampled keys/values, linear-sine RPE
    with coordinate alignment (×sr on the subsampled grid), context on q/k
    (reference twins.py:306-392)."""

    dim: int
    vert_c_dim: int = 64
    sr_ratio: int = 4
    num_heads: int = 8

    @nn.compact
    def __call__(self, x, size, context):
        H, W = size
        BK = x.shape[0]
        C = self.dim
        C_qk = C + self.vert_c_dim

        B = context.shape[0]
        K = BK // B
        c = nn.Dense(self.vert_c_dim, name="context_proj")(
            context.reshape(B, H * W, -1)
        )
        c = jnp.repeat(c[:, None], K, axis=1).reshape(BK, H, W, self.vert_c_dim)

        xm = x.reshape(BK, H, W, C)
        x_qk = jnp.concatenate([xm, c], axis=-1)

        sr = self.sr_ratio
        pad_b = (sr - H % sr) % sr
        pad_r = (sr - W % sr) % sr
        xp = jnp.pad(xm, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        qkp = jnp.pad(x_qk, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        coords = coords_grid(1, Hp, Wp).reshape(1, Hp * Wp, 2)
        enc_q = linear_position_embedding_sine(coords, C_qk)
        q = nn.Dense(C, name="q")(qkp.reshape(BK, Hp * Wp, C_qk) + enc_q)

        # strided k=sr conv subsampling (torch Conv2d(k=sr, s=sr, p=0))
        ksub = nn.Conv(
            C, (sr, sr), strides=(sr, sr), padding="VALID", name="sr_key"
        )(qkp)
        vsub = nn.Conv(
            C, (sr, sr), strides=(sr, sr), padding="VALID", name="sr_value"
        )(xp)
        Hs, Ws = Hp // sr, Wp // sr
        norm = nn.LayerNorm(name="norm")
        ksub = norm(ksub.reshape(BK, Hs * Ws, C))
        vsub = norm(vsub.reshape(BK, Hs * Ws, C))

        coords_s = coords_grid(1, Hs, Ws).reshape(1, Hs * Ws, 2) * sr
        enc_k = linear_position_embedding_sine(coords_s, C)
        k = nn.Dense(C, name="k")(ksub + enc_k)
        v = nn.Dense(C, name="v")(vsub)

        o = _mha(q, k, v, self.num_heads)
        o = o.reshape(BK, Hp, Wp, C)[:, :H, :W, :]
        return nn.Dense(C, name="proj")(o.reshape(BK, H * W, C))


class TwinsBlock(nn.Module):
    """Pre-norm attn + MLP block (reference twins.py:750-789; drop-path is
    identity at the shipped rate 0)."""

    dim: int
    attn_cls: type
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x, size, context):
        y = nn.LayerNorm(name="norm1")(x)
        x = x + self.attn_cls(self.dim, name="attn")(y, size, context)
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, name="mlp_fc1")(y)
        y = nn.Dense(self.dim, name="mlp_fc2")(nn.gelu(y, approximate=False))
        return x + y

    # note: timm Mlp params live at mlp.fc1/mlp.fc2 — handled by an alias
    # rewrite (mlp.fc1 → mlp_fc1) in compat.torch_loader.flowformer_alias


class VerticalSelfAttentionLayer(nn.Module):
    """local 7×7-window block + global subsampled block
    (reference encoder.py:112-137)."""

    dim: int

    @nn.compact
    def __call__(self, x, size, context):
        x = TwinsBlock(self.dim, LocallyGroupedAttnRPEContext, name="local_block")(
            x, size, context
        )
        x = TwinsBlock(self.dim, GlobalSubSampleAttnRPEContext, name="global_block")(
            x, size, context
        )
        return x


class CostPerceiverEncoder(nn.Module):
    """reference encoder.py:245-311."""

    cost_latent_input_dim: int = 64
    cost_latent_token_num: int = 8
    cost_latent_dim: int = 128
    encoder_depth: int = 3

    @nn.compact
    def __call__(self, cost_maps, B, H1, W1, context):
        tokens, (H3, W3) = PatchEmbed(
            self.cost_latent_input_dim, name="patch_embed"
        )(cost_maps)

        K = self.cost_latent_token_num
        D = self.cost_latent_dim
        latent = self.param(
            "latent_tokens", nn.initializers.normal(1.0), (1, K, D)
        )
        latent = jnp.broadcast_to(latent, (B * H1 * W1, K, D))
        x = EncoderCrossAttention(D, name="input_layer")(latent, tokens)

        short_cut = x
        for i in range(self.encoder_depth):
            x = SelfAttentionLayer(D, name=f"encoder_layers_{i}")(x)
            xv = x.reshape(B, H1 * W1, K, D).transpose(0, 2, 1, 3).reshape(
                B * K, H1 * W1, D
            )
            xv = VerticalSelfAttentionLayer(
                D, name=f"vertical_encoder_layers_{i}"
            )(xv, (H1, W1), context)
            x = xv.reshape(B, K, H1 * W1, D).transpose(0, 2, 1, 3).reshape(
                B * H1 * W1, K, D
            )
        return x + short_cut  # cost_encoder_res=True


class MemoryEncoder(nn.Module):
    """reference encoder.py:313-368."""

    n_first_channels: int = 5
    encoder_latent_dim: int = 256
    cost_latent_input_dim: int = 64
    cost_latent_token_num: int = 8
    cost_latent_dim: int = 128
    encoder_depth: int = 3

    @nn.compact
    def __call__(self, im1, im2, context):
        B = im1.shape[0]
        feats = BasicEncoder(
            256, "instance", self.n_first_channels, name="feat_encoder"
        )(jnp.concatenate([im1, im2], axis=0))
        feats = conv2d(
            self.encoder_latent_dim, 1, 1, 0, use_bias=False,
            name="channel_convertor",
        )(feats)
        f1, f2 = jnp.split(feats, 2, axis=0)
        H1, W1 = f1.shape[1:3]
        corr = jnp.einsum("bxyc,buvc->bxyuv", f1, f2, precision=HI)
        cost_maps = corr.reshape(B * H1 * W1, H1, W1, 1)

        cost_memory = CostPerceiverEncoder(
            self.cost_latent_input_dim, self.cost_latent_token_num,
            self.cost_latent_dim, self.encoder_depth,
            name="cost_perceiver_encoder",
        )(cost_maps, B, H1, W1, context)
        return cost_memory, cost_maps, (H1, W1)


class FFUpdateBlock(nn.Module):
    """GMAUpdateBlock (reference gru.py:115-143): motion encoder over the
    145-ch [cost_global(64) + cost_forward(81)] corr features."""

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


class MemoryDecoder(nn.Module):
    """reference decoder.py:151-263."""

    query_latent_dim: int = 64
    decoder_depth: int = 12

    @nn.compact
    def __call__(self, cost_memory, cost_maps, context, size):
        B, H1, W1 = size
        D = self.query_latent_dim

        ctx = conv2d(256, 1, 1, 0, name="proj")(context)
        net = nn.tanh(ctx[..., :128])
        inp = nn.relu(ctx[..., 128:])
        attention = GMAAttention(128, name="att")(inp)

        coords0 = coords_grid(B, H1, W1)
        coords1 = coords0

        cross = DecoderCrossAttention(D, name="decoder_layer_cross_attend")
        # k/v projected from memory once (decoder.py:64-66)
        mem_k = nn.Dense(D, name="decoder_layer_cross_attend_k")(cost_memory)
        mem_v = nn.Dense(D, name="decoder_layer_cross_attend_v")(cost_memory)

        fte0 = conv2d(D, 1, 1, 0, name="flow_token_encoder_0")
        fte2 = conv2d(D, 1, 1, 0, name="flow_token_encoder_2")
        update_block = FFUpdateBlock(name="update_block")

        r = 4
        offs = jnp.arange(-r, r + 1, dtype=jnp.float32)

        flows = []
        for _ in range(self.decoder_depth):
            coords1 = jax.lax.stop_gradient(coords1)
            # 9×9 cost patch at coords1; x offset varies along the OUTER
            # window axis (the reference adds the dy-meshgrid output to the
            # x channel, decoder.py:196-205 — same set, x-major layout)
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

            q = fte2(nn.gelu(fte0(cost_forward), approximate=False))
            q = q.reshape(B * H1 * W1, 1, D)
            pos = linear_position_embedding_sine(
                coords1.reshape(B * H1 * W1, 1, 2), D
            )
            cost_global = cross(q, mem_k, mem_v, pos).reshape(B, H1, W1, D)
            corr_feat = jnp.concatenate([cost_global, cost_forward], axis=-1)

            flow = coords1 - coords0
            net, up_mask, delta = update_block(net, inp, corr_feat, flow, attention)
            coords1 = coords1 + delta
            flows.append(convex_upsample_flow(coords1 - coords0, up_mask))
        return flows


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

        cost_memory, cost_maps, (H1, W1) = MemoryEncoder(
            self.n_first_channels, self.encoder_latent_dim,
            self.cost_latent_input_dim, self.cost_latent_token_num,
            self.cost_latent_dim, self.encoder_depth, name="memory_encoder",
        )(im1, im2, context)

        flows = MemoryDecoder(
            self.query_latent_dim, self.decoder_depth, name="memory_decoder"
        )(cost_memory, cost_maps, context, (B, H1, W1))

        flows = [padder.unpad(f) for f in flows]
        return (events1, events2), jnp.stack(flows, axis=0)
