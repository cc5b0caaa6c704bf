"""UNet family + MIMO-UNet (event-density enhancement frontends).

Parity targets:
  * ``UNet``/``UNetL``/``UNetLittle`` — reference ``model/unet.py:50,165,261``:
    classic conv-BN-relu ×2 blocks, maxpool down, nearest-upsample+conv up,
    skip concat; base widths 32/16/32, depths 5/5/3; optional
    InstanceNorm+ReLU output activation.
  * ``MIMOUNet`` — the reference imports ``model.MIMO_unet.mimo_unet``
    which is ABSENT from the repo (SURVEY.md §2.12 missing module 2).  This
    is a from-scratch reimplementation of the MIMO-UNet-small architecture
    (Cho et al. 2021) matching the call surface the reference code expects:
    ``unet([ev1, ev2], with_res=...) → [ (out1_s4, out2_s4), (..s2..),
    (..full..) ]`` — multi-scale enhanced event volumes, finest last
    (consumed at ``unite_unet_raft.py:405-406``).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.layers import conv2d
from eemflow_tpu.ops.upsample import resize_bilinear


def max_pool2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class ConvBlock(nn.Module):
    """conv-BN-relu ×2 (reference unet.py:10-28)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.features, 3, 1, 1, name="0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="1")(x)
        x = nn.relu(x)
        x = conv2d(self.features, 3, 1, 1, name="3")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="4")(x)
        return nn.relu(x)


class UpConv(nn.Module):
    """2× nearest upsample + conv-BN-relu (reference unet.py:31-47)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest, torch Upsample default
        x = conv2d(self.features, 3, 1, 1, name="1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="2")(x)
        return nn.relu(x)


class UNet(nn.Module):
    """5-level UNet (reference ``model/unet.py:50-163``), base width 32."""

    out_ch: int = 5
    base: int = 32
    depth: int = 4  # number of downsamplings
    if_out_active: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = [self.base * (2**i) for i in range(self.depth + 1)]
        skips = []
        e = x
        for i in range(self.depth + 1):
            if i > 0:
                e = max_pool2(e)
            e = ConvBlock(f[i], name=f"Conv{i + 1}")(e, train)
            skips.append(e)

        d = skips[-1]
        for i in range(self.depth, 0, -1):
            d = UpConv(f[i - 1], name=f"Up{i + 1}")(d, train)
            d = jnp.concatenate([skips[i - 1], d], axis=-1)
            d = ConvBlock(f[i - 1], name=f"Up_conv{i + 1}")(d, train)

        out = conv2d(self.out_ch, 1, 1, 0, name="Conv")(d)
        if self.if_out_active:
            mean = jnp.mean(out, axis=(1, 2), keepdims=True)
            var = jnp.var(out, axis=(1, 2), keepdims=True)
            out = nn.relu((out - mean) * jax.lax.rsqrt(var + 1e-5))
        return out


def UNetL(out_ch: int = 5, if_out_active: bool = False) -> UNet:
    """n1=16 variant (reference ``unet.py:165``)."""
    return UNet(out_ch=out_ch, base=16, depth=4, if_out_active=if_out_active)


def UNetLittle(out_ch: int = 5, if_out_active: bool = False) -> UNet:
    """3-level variant (reference ``unet.py:261``)."""
    return UNet(out_ch=out_ch, base=32, depth=2, if_out_active=if_out_active)


class ResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(conv2d(self.features, 3, 1, 1, name="conv1")(x))
        y = conv2d(self.features, 3, 1, 1, name="conv2")(y)
        return x + y


class _EBlock(nn.Module):
    features: int
    num_res: int = 2

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_res):
            x = ResBlock(self.features, name=f"res{i}")(x)
        return x


class _SCM(nn.Module):
    """Shallow feature extraction for downscaled inputs."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        y = nn.relu(conv2d(self.features // 2, 3, 1, 1, name="conv1")(x))
        y = nn.relu(conv2d(self.features - in_ch, 3, 1, 1, name="conv2")(y))
        y = jnp.concatenate([y, x], axis=-1)
        return conv2d(self.features, 1, 1, 0, name="fuse")(y)


class _FAM(nn.Module):
    """Feature attention fusion: elementwise product + residual conv."""

    features: int

    @nn.compact
    def __call__(self, a, b):
        return b + conv2d(self.features, 3, 1, 1, name="merge")(a * b)


class MIMOUNet(nn.Module):
    """Multi-input multi-output UNet (small), 3 scales.

    __call__(x [B,H,W,C]) → [out_s4, out_s2, out_full] each [B,·,·,out_ch]
    (coarse→fine; with_res adds the respective-scale input).
    """

    out_ch: int = 5
    base: int = 16
    num_res: int = 2

    @nn.compact
    def __call__(self, x, with_res: bool = True, train: bool = False):
        f = self.base
        B, H, W, C = x.shape
        x2 = resize_bilinear(x, (H // 2, W // 2))
        x4 = resize_bilinear(x, (H // 4, W // 4))

        # encoder
        e1 = nn.relu(conv2d(f, 3, 1, 1, name="feat1")(x))
        e1 = _EBlock(f, self.num_res, name="eb1")(e1)

        z2 = _SCM(f * 2, name="scm2")(x2)
        d1 = nn.relu(conv2d(f * 2, 3, 2, 1, name="down1")(e1))
        e2 = _FAM(f * 2, name="fam2")(z2, d1)
        e2 = _EBlock(f * 2, self.num_res, name="eb2")(e2)

        z4 = _SCM(f * 4, name="scm4")(x4)
        d2 = nn.relu(conv2d(f * 4, 3, 2, 1, name="down2")(e2))
        e3 = _FAM(f * 4, name="fam4")(z4, d2)
        e3 = _EBlock(f * 4, self.num_res, name="eb3")(e3)

        # decoder with multi-scale outputs
        out4 = conv2d(self.out_ch, 3, 1, 1, name="out4")(
            _EBlock(f * 4, self.num_res, name="db3")(e3)
        )
        u2 = UpConvT(f * 2, name="up2")(e3)
        m2 = _EBlock(f * 2, self.num_res, name="db2")(
            conv2d(f * 2, 1, 1, 0, name="fuse2")(jnp.concatenate([u2, e2], axis=-1))
        )
        out2 = conv2d(self.out_ch, 3, 1, 1, name="out2")(m2)
        u1 = UpConvT(f, name="up1")(m2)
        m1 = _EBlock(f, self.num_res, name="db1")(
            conv2d(f, 1, 1, 0, name="fuse1")(jnp.concatenate([u1, e1], axis=-1))
        )
        out1 = conv2d(self.out_ch, 3, 1, 1, name="out1")(m1)

        if with_res:
            out4 = out4 + x4[..., : self.out_ch]
            out2 = out2 + x2[..., : self.out_ch]
            out1 = out1 + x[..., : self.out_ch]
        return [out4, out2, out1]


class UpConvT(nn.Module):
    """2× transposed-conv upsampling (k=4, s=2, p=1 equivalent)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.features, (4, 4), strides=(2, 2), padding="SAME",
            name="deconv",
        )(x)
