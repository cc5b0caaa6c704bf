"""Shared NN building blocks (flax.linen, NHWC).

Conv padding is always passed explicitly as torch-style symmetric tuples so
output positions match torch exactly (XLA 'SAME' distributes asymmetric pads
differently for stride 2).  Initializers mirror the reference's
``kaiming_normal_`` calls.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch nn.init.kaiming_normal_(w) default: fan_in, gain=sqrt(2), normal
kaiming_in = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
# reference extractor.py:153 uses mode='fan_out'
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def leaky_relu01(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class Conv(nn.Module):
    """torch-style Conv2d: explicit symmetric padding, NHWC."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: Callable = kaiming_in

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = self.padding
        if p is None:
            p = ((k - 1) * self.dilation) // 2
        return nn.Conv(
            self.features,
            (k, k),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            name="conv",
        )(x)


class ConvRelu(nn.Module):
    """conv + LeakyReLU(0.1) — reference ``EEMFlow.py:26-30`` convrelu."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        x = Conv(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            self.dilation,
            self.groups,
            name="0",
        )(x)
        return leaky_relu01(x)


class Deconv(nn.Module):
    """torch ConvTranspose2d(k=4, s=2, p=1) equivalent (NHWC)."""

    features: int

    @nn.compact
    def __call__(self, x):
        # torch convtranspose: out = (H-1)*2 - 2*1 + 4 = 2H.
        # lax equivalent: lhs_dilation=2, padding k-1-p on both sides, and the
        # kernel is *flipped* relative to a cross-correlation.
        y = jax.lax.conv_general_dilated(
            x,
            self.param(
                "kernel", kaiming_in, (4, 4, x.shape[-1], self.features), jnp.float32
            )[::-1, ::-1],
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return y + b


def channel_shuffle(x: jax.Array, groups: int) -> jax.Array:
    """ShuffleNet channel shuffle (reference ``EEMFlow.py:51-57``)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H, W, groups, C // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(B, H, W, C)


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d default: affine=False, eps=1e-5, per-sample HW stats."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


class GroupNorm(nn.Module):
    """torch GroupNorm (affine), NHWC."""

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps, name="gn")(x)


class BatchNorm(nn.Module):
    """torch BatchNorm2d (affine, running stats), NHWC.

    ``use_running_average`` follows the train flag threaded through models.
    """

    use_running_average: bool = True
    eps: float = 1e-5
    momentum: float = 0.9  # flax momentum = 1 - torch momentum (0.1)

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            epsilon=self.eps,
            momentum=self.momentum,
            name="bn",
        )(x)
