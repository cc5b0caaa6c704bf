"""RAFT-lineage shared blocks (flax, NHWC).

Parity targets:
  * ``ResidualBlock``/``BasicEncoder`` — reference ``model/extractor.py``:
    7×7/2 stem + 3 residual stages (64, 96, 128) at /8, norm ∈
    {group, batch, instance, none}, 1×1 output head.
  * ``BasicMotionEncoder``/``SepConvGRU``/``FlowHead``/``BasicUpdateBlock`` —
    reference ``model/update.py``: corr+flow → 128-ch motion features,
    1×5 then 5×1 ConvGRU, flow head, convex-upsample mask head with the
    ×0.25 gradient-balance scale (``update.py:105``).

Module names mirror torch attribute paths for mechanical checkpoint
conversion (Sequential indices where torch uses Sequential).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.layers import InstanceNorm, conv2d, kaiming_out


def make_norm(norm_fn: str, channels: int, name: str, train: bool):
    """Return a callable applying the requested norm."""
    if norm_fn == "group":
        return nn.GroupNorm(num_groups=channels // 8, epsilon=1e-5, name=name)
    if norm_fn == "batch":
        bn = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-5, momentum=0.9, name=name
        )
        return bn
    if norm_fn == "instance":
        return InstanceNorm(name=name)
    return lambda x: x


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str = "group"
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = conv2d(self.planes, 3, self.stride, 1, kernel_init=kaiming_out, name="conv1")(x)
        y = nn.relu(make_norm(self.norm_fn, self.planes, "norm1", train)(y))
        y = conv2d(self.planes, 3, 1, 1, kernel_init=kaiming_out, name="conv2")(y)
        y = nn.relu(make_norm(self.norm_fn, self.planes, "norm2", train)(y))
        if self.stride != 1:
            x = conv2d(
                self.planes, 1, self.stride, 0, kernel_init=kaiming_out, name="downsample_0"
            )(x)
            x = make_norm(self.norm_fn, self.planes, "norm3", train)(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    output_dim: int = 128
    norm_fn: str = "batch"
    n_first_channels: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(64, 7, 2, 3, kernel_init=kaiming_out, name="conv1")(x)
        x = nn.relu(make_norm(self.norm_fn, 64, "norm1", train)(x))
        x = ResidualBlock(64, self.norm_fn, 1, name="layer1_0")(x, train)
        x = ResidualBlock(64, self.norm_fn, 1, name="layer1_1")(x, train)
        x = ResidualBlock(96, self.norm_fn, 2, name="layer2_0")(x, train)
        x = ResidualBlock(96, self.norm_fn, 1, name="layer2_1")(x, train)
        x = ResidualBlock(128, self.norm_fn, 2, name="layer3_0")(x, train)
        x = ResidualBlock(128, self.norm_fn, 1, name="layer3_1")(x, train)
        return conv2d(self.output_dim, 1, 1, 0, kernel_init=kaiming_out, name="conv2")(x)


class FlowHead(nn.Module):
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.relu(conv2d(self.hidden_dim, 3, 1, 1, name="conv1")(x))
        return conv2d(2, 3, 1, 1, name="conv2")(x)


class SepConvGRU(nn.Module):
    """1×5 then 5×1 separable ConvGRU (reference update.py:33-60)."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h, x):
        def conv_1xk(name):
            return nn.Conv(
                self.hidden_dim, (1, 5), padding=((0, 0), (2, 2)), name=name
            )

        def conv_kx1(name):
            return nn.Conv(
                self.hidden_dim, (5, 1), padding=((2, 2), (0, 0)), name=name
            )

        # horizontal
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(conv_1xk("convz1")(hx))
        r = nn.sigmoid(conv_1xk("convr1")(hx))
        q = nn.tanh(conv_1xk("convq1")(jnp.concatenate([r * h, x], axis=-1)))
        h = (1 - z) * h + z * q
        # vertical
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(conv_kx1("convz2")(hx))
        r = nn.sigmoid(conv_kx1("convr2")(hx))
        q = nn.tanh(conv_kx1("convq2")(jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class BasicMotionEncoder(nn.Module):
    corr_levels: int = 4
    corr_radius: int = 4

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(conv2d(256, 1, 1, 0, name="convc1")(corr))
        cor = nn.relu(conv2d(192, 3, 1, 1, name="convc2")(cor))
        flo = nn.relu(conv2d(128, 7, 1, 3, name="convf1")(flow))
        flo = nn.relu(conv2d(64, 3, 1, 1, name="convf2")(flo))
        out = nn.relu(
            conv2d(128 - 2, 3, 1, 1, name="conv")(jnp.concatenate([cor, flo], axis=-1))
        )
        return jnp.concatenate([out, flow], axis=-1)


class BasicUpdateBlock(nn.Module):
    """setup-style so the convex-upsample mask head is separately callable:
    in eval-throughput mode (``raft_refine(upsample_all=False)``) the mask
    — ~30% of the update block's conv FLOPs — runs ONCE on the final net
    instead of inside every scan iteration (bit-identical final flow; the
    reference computes it every iteration, ``model/update.py:97-106``)."""

    hidden_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4

    def setup(self):
        self.encoder = BasicMotionEncoder(self.corr_levels, self.corr_radius)
        self.gru = SepConvGRU(self.hidden_dim)
        self.flow_head = FlowHead(256)
        self.mask_0 = conv2d(self.hidden_dim * 2, 3, 1, 1)
        self.mask_2 = conv2d(64 * 9, 1, 1, 0)

    def mask(self, net):
        return 0.25 * self.mask_2(nn.relu(self.mask_0(net)))

    def __call__(self, net, inp, corr, flow, compute_mask: bool = True):
        motion = self.encoder(flow, corr)
        gru_in = jnp.concatenate([inp, motion], axis=-1)
        net = self.gru(net, gru_in)
        delta_flow = self.flow_head(net)
        up_mask = self.mask(net) if compute_mask else None
        return net, up_mask, delta_flow
