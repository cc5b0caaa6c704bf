"""Torchvision-style ResNet encoder (reference ``model/resnet.py``),
kept for feature-extraction baselines."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from eemflow_tpu.models.layers import conv2d, kaiming_out


class BasicResBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, name=name)

        y = conv2d(self.planes, 3, self.stride, 1, use_bias=False,
                   kernel_init=kaiming_out, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = conv2d(self.planes, 3, 1, 1, use_bias=False, kernel_init=kaiming_out,
                   name="conv2")(y)
        y = bn("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = bn("bns")(
                conv2d(self.planes, 1, self.stride, 0, use_bias=False,
                       kernel_init=kaiming_out, name="downsample")(x)
            )
        return nn.relu(x + y)


class ResNet(nn.Module):
    """ResNet-18/34-style encoder; returns the final feature map."""

    layers: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)
    n_first_channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(64, 7, 2, 3, use_bias=False, kernel_init=kaiming_out, name="conv1")(x)
        x = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x)
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for s, (n, w) in enumerate(zip(self.layers, self.widths)):
            for b in range(n):
                stride = 2 if (b == 0 and s > 0) else 1
                x = BasicResBlock(w, stride, name=f"layer{s + 1}_{b}")(x, train)
        return x
