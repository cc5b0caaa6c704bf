"""GMFlowNet — global matching + overlapping attention
(reference ``model/GMflownet/``: gmflownet_model.py, swin_transformer.py,
extractor.py).

Structure (use_mix_attn=True, the shipped default — ``gmflownet_model.py:
26-58``):
  * fnet: 3× stride-2 conv encoder (instance norm) + 6 MixAxialPOLA blocks —
    each block splits channels into a POLA branch (7×7 window queries
    attending to the 3×3 window neighborhood with learned relative-position
    bias) and two axial-attention branches (full-row / full-column), then
    joint projection + MLP (pre-LayerNorm),
  * cnet: batch-norm RAFT encoder,
  * match initialization: softCorrMap = softmax(corr, dim=2)·softmax(corr,
    dim=1); mutually-consistent argmax pairs initialize coords1
    (``gmflownet_model.py:128-158``),
  * standard RAFT refinement; training also returns softCorrMap for the
    matching loss (``train.losses_extra.compute_coarse_loss``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from eemflow_tpu.models.eraft import coords_grid, raft_refine
from eemflow_tpu.models.kpaflow import _patchify, _unpatchify, _window_keys
from eemflow_tpu.models.layers import conv2d
from eemflow_tpu.models.layers import InstanceNorm
from eemflow_tpu.models.raft_core import BasicEncoder, BasicUpdateBlock
from eemflow_tpu.ops.corr_block import build_corr_pyramid
from eemflow_tpu.ops.pad import InputPadder

HI = jax.lax.Precision.HIGHEST


class BasicConvEncoder(nn.Module):
    """3 stride-2 convs, /8 (reference extractor.py:249-300)."""

    output_dim: int = 256
    n_first_channels: int = 5

    @nn.compact
    def __call__(self, x):
        half = max(self.output_dim // 2, 64)
        x = nn.relu(InstanceNorm(name="norm1")(conv2d(64, 7, 2, 3, name="conv1")(x)))
        x = nn.relu(InstanceNorm(name="norm2")(conv2d(half, 3, 2, 1, name="conv2")(x)))
        x = nn.relu(
            InstanceNorm(name="norm3")(
                conv2d(self.output_dim, 3, 2, 1, name="conv3")(x)
            )
        )
        return x


class POLAWindowAttention(nn.Module):
    """Patch-overlapping window attention with relative position bias
    (reference swin_transformer.py:636-815).  Queries: ws×ws windows; keys:
    the surrounding 3ws×3ws neighborhood (patch-major layout, bias indexed
    consistently)."""

    dim: int
    num_heads: int
    window_size: int = 7

    @nn.compact
    def __call__(self, x):
        ws = self.window_size
        B, H, W, C = x.shape
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        xp = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        hs, ws_n = Hp // ws, Wp // ws

        # reference semantics (swin_transformer.py:984-1001): the RAW
        # features are zero-padded (to the window multiple AND the ws halo)
        # BEFORE the biased q/k/v projections — padded neighborhood keys
        # therefore attend as Wk/Wv-bias vectors, with no validity mask.
        hd = self.dim // self.num_heads
        qp = nn.Dense(self.dim, name="Wq")(_patchify(xp, ws))  # [B, n, ws², C]
        raw_halo = jnp.pad(xp, ((0, 0), (ws, ws), (ws, ws), (0, 0)))
        kw_raw = _window_keys(raw_halo, ws)  # [B, n, 9ws², C]
        kw = nn.Dense(self.dim, name="Wk")(kw_raw)
        vw = nn.Dense(self.dim, name="Wv")(kw_raw)

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], t.shape[2], self.num_heads, hd)

        scores = jnp.einsum(
            "bnqhd,bnkhd->bnhqk", split_heads(qp), split_heads(kw), precision=HI
        ) * (hd**-0.5)

        # relative position bias, indexed by (query offset − key offset);
        # offsets in the same patch-major layout as _window_keys
        offs = np.array(
            [
                ((dy - 1) * ws + iy, (dx - 1) * ws + ix)
                for dy in range(3)
                for dx in range(3)
                for iy in range(ws)
                for ix in range(ws)
            ],
            np.int32,
        )  # [9ws², 2] in [-ws, 2ws)
        qy = np.repeat(np.arange(ws), ws)
        qx = np.tile(np.arange(ws), ws)
        rel_y = (qy[:, None] - offs[None, :, 0] + 2 * ws - 1).astype(np.int32)
        rel_x = (qx[:, None] - offs[None, :, 1] + 2 * ws - 1).astype(np.int32)
        n_rel = 4 * ws - 1
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            (n_rel * n_rel, self.num_heads),
        )
        bias_idx = jnp.asarray(rel_y * n_rel + rel_x)  # [ws², 9ws²]
        bias = bias_table[bias_idx]  # [ws², 9ws², heads]
        scores = scores + bias.transpose(2, 0, 1)[None, None]
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bnhqk,bnkhd->bnqhd", attn, split_heads(vw), precision=HI)
        out = out.reshape(B, hs * ws_n, ws * ws, self.dim)
        # NeighborWindowAttention's own output projection (use_proj=True,
        # swin_transformer.py:692-693) — the block's joint proj comes after
        out = nn.Dense(self.dim, name="proj")(out)
        out = _unpatchify(out, ws, hs, ws_n)[:, :H, :W, :]
        return out


class AxialAttention(nn.Module):
    """Multi-head attention along one spatial axis (reference
    MultiHeadAttention used axially, swin_transformer.py:951-955)."""

    dim: int
    num_heads: int
    axis: int  # 1 = vertical (over H), 2 = horizontal (over W)

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if self.axis == 2:
            seq = x.reshape(B * H, W, C)
        else:
            seq = x.transpose(0, 2, 1, 3).reshape(B * W, H, C)
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, name="Wq")(seq)
        k = nn.Dense(self.dim, name="Wk")(seq)
        v = nn.Dense(self.dim, name="Wv")(seq)

        def sh(t):
            return t.reshape(t.shape[0], t.shape[1], self.num_heads, hd)

        scores = jnp.einsum("blhd,bmhd->bhlm", sh(q), sh(k), precision=HI) * (
            hd**-0.5
        )
        out = jnp.einsum(
            "bhlm,bmhd->blhd", jax.nn.softmax(scores, -1), sh(v), precision=HI
        ).reshape(seq.shape[0], seq.shape[1], self.dim)
        if self.axis == 2:
            return out.reshape(B, H, W, self.dim)
        return out.reshape(B, W, H, self.dim).transpose(0, 2, 1, 3)


class MixAxialPOLABlock(nn.Module):
    """reference swin_transformer.py:910-1010."""

    dim: int = 256
    num_heads: int = 8
    window_size: int = 7
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        hd = self.dim // self.num_heads
        axis_heads = 2
        local_heads = self.num_heads - 2 * axis_heads
        local_chl = local_heads * hd
        axis_chl = axis_heads * hd

        shortcut = x
        y = nn.LayerNorm(name="norm1")(x)
        y_local = y[..., :local_chl]
        y_horiz = y[..., local_chl : local_chl + axis_chl]
        y_verti = y[..., local_chl + axis_chl :]

        o_local = POLAWindowAttention(
            local_chl, local_heads, self.window_size, name="localAttn"
        )(y_local)
        o_horiz = AxialAttention(axis_chl, axis_heads, axis=2, name="horizAttn")(y_horiz)
        o_verti = AxialAttention(axis_chl, axis_heads, axis=1, name="vertiAttn")(y_verti)

        y = jnp.concatenate([o_local, o_horiz, o_verti], axis=-1)
        y = nn.Dense(self.dim, name="proj")(y)
        x = shortcut + y

        z = nn.LayerNorm(name="norm2")(x)
        z = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(z)
        z = nn.Dense(self.dim, name="mlp_fc2")(nn.gelu(z, approximate=False))
        return x + z


class GMFlowNetModel(nn.Module):
    n_first_channels: int = 5
    iters: int = 12
    depth: int = 6
    num_heads: int = 8
    window_size: int = 7
    corr_levels: int = 4
    corr_radius: int = 4
    pad_rate: int = 8
    upsample_all: bool = True  # False = final-only convex upsample (eval)
    corr_fast: bool = False  # bf16 corr matmuls, fp32 accum (serving mode)
    cnet_norm: str = "batch"  # "instance" for the unite RES_IN variants

    @nn.compact
    def __call__(self, events1, events2, iters: Optional[int] = None,
                 flow_init: Optional[jax.Array] = None, train: bool = False):
        n_iters = self.iters if iters is None else iters
        B, H, W, _ = events1.shape
        padder = InputPadder((H, W), mode="chairs", eval_pad_rate=self.pad_rate)
        im1, im2 = padder.pad(events1, events2)

        conv_enc = BasicConvEncoder(256, self.n_first_channels, name="fnet_0")
        f1 = conv_enc(im1)
        f2 = conv_enc(im2)
        for i in range(self.depth):
            blk = MixAxialPOLABlock(
                256, self.num_heads, self.window_size, name=f"fnet_1_blocks_{i}"
            )
            f1 = blk(f1)
            f2 = blk(f2)
        final_norm = nn.LayerNorm(name="fnet_1_norm")
        fmap1 = final_norm(f1)
        fmap2 = final_norm(f2)

        pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels,
                                     fast=self.corr_fast)
        fh, fw = fmap1.shape[1:3]
        # match-init softmaxes in fp32 even in corr_fast mode (the mutual
        # argmax is tie-sensitive; the cast is negligible vs the matmul)
        corr_map = (
            pyramid[0].astype(jnp.float32)
            .reshape(B, fh * fw, fh, fw).reshape(B, fh * fw, fh * fw)
        )
        soft_corr_map = jax.nn.softmax(corr_map, axis=2) * jax.nn.softmax(
            corr_map, axis=1
        )

        cnet = BasicEncoder(256, self.cnet_norm, self.n_first_channels, name="cnet")(
            im1, train=train
        )
        net = nn.tanh(cnet[..., :128])
        inp = nn.relu(cnet[..., 128:])

        coords0 = coords_grid(B, fh, fw)
        if flow_init is not None:
            coords1 = coords0 + flow_init
        else:
            # mutual-max match initialization (gmflownet_model.py:140-158)
            match12 = jnp.max(soft_corr_map, axis=2)
            idx12 = jnp.argmax(soft_corr_map, axis=2)
            match21 = jnp.max(soft_corr_map, axis=1)
            match21_g = jnp.take_along_axis(match21, idx12, axis=1)
            matched = (match12 - match21_g) == 0
            ident = jnp.tile(jnp.arange(fh * fw)[None], (B, 1))
            coords_index = jnp.where(matched, idx12, ident).reshape(B, fh, fw)
            cx = (coords_index % fw).astype(jnp.float32)
            cy = (coords_index // fw).astype(jnp.float32)
            coords1 = jnp.stack([cx, cy], axis=-1)

        update_block = BasicUpdateBlock(
            128, self.corr_levels, self.corr_radius, name="update_block"
        )
        flows = raft_refine(
            update_block, pyramid, net, inp, coords0, coords1, n_iters,
            self.corr_radius, upsample_all=self.upsample_all,
        )
        flows = padder.unpad(flows)
        if train:
            return (events1, events2), (flows, soft_corr_map)
        return (events1, events2), flows
