"""Selective-kernel fusion of sparse/dense event features
(reference ``model/sknet.py``).

  * ``SKFuse`` — reference ``SK`` (sknet.py:9-92): per-pixel 2-way softmax
    attention over (event, enhanced-event) computed by a small
    conv-IN-relu net on their sum.
  * ``SKScoreFuse`` — reference ``SK_score`` (sknet.py:94-170): global
    (GAP) 2-way scalar gating.
  * ``SKConv``/``SKUnit``/``SKNet`` — reference sknet.py:172-317: the
    classic selective-kernel classifier stack (multi-branch dilated convs,
    global attention over branches).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.layers import InstanceNorm, conv2d


class SKFuse(nn.Module):
    """Per-pixel selective fusion (reference SK)."""

    @nn.compact
    def __call__(self, event, d_event):
        u = event + d_event
        z = conv2d(16, 3, 1, 1, use_bias=False, name="fc_0")(u)
        z = nn.relu(InstanceNorm(name="fc_1")(z))
        z = conv2d(2, 3, 1, 1, use_bias=False, name="fc_3")(z)
        z = nn.relu(InstanceNorm(name="fc_4")(z))
        attn = jax.nn.softmax(z, axis=-1)
        return attn[..., :1] * event + attn[..., 1:] * d_event


class SKScoreFuse(nn.Module):
    """Global scalar selective fusion (reference SK_score)."""

    @nn.compact
    def __call__(self, event, d_event):
        u = event + d_event
        s = jnp.mean(u, axis=(1, 2), keepdims=True)  # GAP
        z = conv2d(16, 1, 1, 0, use_bias=False, name="fc_0")(s)
        z = nn.relu(InstanceNorm(name="fc_1")(z))
        scores = jnp.concatenate(
            [
                conv2d(1, 1, 1, 0, name="fcs_0")(z),
                conv2d(1, 1, 1, 0, name="fcs_1")(z),
            ],
            axis=-1,
        )
        attn = jax.nn.softmax(scores, axis=-1)
        return attn[..., :1] * event + attn[..., 1:] * d_event


class SKConv(nn.Module):
    """Selective-kernel conv: M dilated branches + global branch attention
    (reference sknet.py:172-225)."""

    features: int
    M: int = 2
    G: int = 32
    r: int = 16
    stride: int = 1
    L: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = max(self.features // self.r, self.L)
        feats = []
        for i in range(self.M):
            y = conv2d(
                self.features, 3, self.stride, dilation=1 + i,
                groups=self.G, use_bias=False, name=f"conv{i}_0",
            )(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"conv{i}_1")(y)
            feats.append(nn.relu(y))
        stacked = jnp.stack(feats, axis=1)  # [B, M, H, W, C]
        u = jnp.sum(stacked, axis=1)
        s = jnp.mean(u, axis=(1, 2), keepdims=True)
        z = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9, name="fc_1")(
                conv2d(d, 1, 1, 0, use_bias=False, name="fc_0")(s)
            )
        )
        scores = jnp.stack(
            [conv2d(self.features, 1, 1, 0, name=f"fcs{i}")(z) for i in range(self.M)],
            axis=1,
        )  # [B, M, 1, 1, C]
        attn = jax.nn.softmax(scores, axis=1)
        return jnp.sum(stacked * attn, axis=1)


class SKUnit(nn.Module):
    """Bottleneck with an SKConv in the middle (reference sknet.py:227-273)."""

    mid_features: int
    out_features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, name=name)

        y = nn.relu(bn("bn1")(conv2d(self.mid_features, 1, 1, 0, use_bias=False, name="conv1")(x)))
        y = SKConv(self.mid_features, stride=self.stride, name="sk")(y, train)
        y = nn.relu(bn("bn2")(y))
        y = bn("bn3")(conv2d(self.out_features, 1, 1, 0, use_bias=False, name="conv3")(y))
        if x.shape[-1] != self.out_features or self.stride != 1:
            x = bn("bns")(
                conv2d(self.out_features, 1, self.stride, 0, use_bias=False, name="shortcut")(x)
            )
        return nn.relu(x + y)


class SKNet(nn.Module):
    """SK classifier backbone (reference sknet.py:275-317)."""

    num_classes: int = 1000
    nums_block_list: Sequence[int] = (3, 4, 6, 3)
    strides_list: Sequence[int] = (1, 2, 2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(64, 7, 2, 3, use_bias=False, name="stem")(x)
        x = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9, name="stem_bn")(x)
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        widths = [256, 512, 1024, 2048]
        for s, (n_blocks, stride, w) in enumerate(
            zip(self.nums_block_list, self.strides_list, widths)
        ):
            for b in range(n_blocks):
                x = SKUnit(
                    w // 2, w, stride if b == 0 else 1, name=f"stage{s}_block{b}"
                )(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="classifier")(x)
