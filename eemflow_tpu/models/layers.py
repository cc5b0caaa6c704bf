"""Shared NN building blocks (flax.linen, NHWC).

Conv padding is always passed explicitly as torch-style symmetric tuples so
output positions match torch exactly (XLA 'SAME' distributes asymmetric pads
differently for stride 2).  Initializers mirror the reference's
``kaiming_normal_`` calls.  Module names mirror torch attribute paths
(Sequential index '0' for the conv inside conv+relu blocks) so the
checkpoint converter is a mechanical key rewrite.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch nn.init.kaiming_normal_(w) default: fan_in, gain=sqrt(2), normal
kaiming_in = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
# reference extractor.py:153 uses mode='fan_out'
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def leaky_relu01(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def conv2d(
    features: int,
    kernel_size: int = 3,
    stride: int = 1,
    padding: Optional[int] = None,
    dilation: int = 1,
    groups: int = 1,
    use_bias: bool = True,
    kernel_init: Callable = kaiming_in,
    name: Optional[str] = None,
) -> nn.Conv:
    """torch-style Conv2d: explicit symmetric padding, NHWC."""
    k = kernel_size
    p = padding
    if p is None:
        p = ((k - 1) * dilation) // 2
    return nn.Conv(
        features,
        (k, k),
        strides=(stride, stride),
        padding=((p, p), (p, p)),
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_init=kernel_init,
        name=name,
    )


class ConvRelu(nn.Module):
    """conv + LeakyReLU(0.1) — reference ``EEMFlow.py:26-30`` convrelu.

    The conv is named '0' to mirror the torch Sequential layout."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        x = conv2d(
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
    """torch ConvTranspose2d(k=4, s=2, p=1) equivalent (NHWC).

    Param 'kernel' is stored in torch layout [Cin, Cout, kh, kw] so
    checkpoint conversion is a straight copy; the apply path builds the
    equivalent dilated cross-correlation (flip kernel, swap in/out).
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", kaiming_in, (4, 4, cin, self.features), jnp.float32)
        # transposed conv == conv with lhs_dilation=s, padding k-1-p (=2,
        # symmetric; output exactly 2×input), flipped kernel
        y = jax.lax.conv_general_dilated(
            x,
            w[::-1, ::-1],
            window_strides=(1, 1),
            padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if not self.use_bias:
            return y
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
