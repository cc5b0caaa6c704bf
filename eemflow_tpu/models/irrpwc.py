"""IRR-PWC — iterative-residual PWC-Net adapted to event voxels
(reference ``model/IRRPWC/pwcnet_irr.py`` + ``pwc_modules.py``).

6-level stride-2 conv pyramid (5→16→32→64→96→128→196 channels, coarse
first); at each of the 5 coarsest levels: warp the second-view features by
the upsampled flow (div_flow=0.05 normalization, reference
``pwcnet_irr.py:10,83-92``), 9×9 mean cost volume (the pure-PyTorch twin of
the CUDA correlation, ``pwc_modules.py:43-64`` — our shared
``local_correlation`` op), shared dense flow estimator + dilated context
network (iterative residual refinement: ONE estimator reused across
levels).  Predictions are upsampled to input size and ÷div_flow.

The reference's WarpingLayer builds its sampling grid with
``linspace(-1,1)`` + align_corners=True and masks by a warped-ones ≥ 1.0
threshold; we use the equivalent exact pixel-coordinate sampling with an
analytic in-bounds mask.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.layers import ConvRelu, conv2d, leaky_relu01
from eemflow_tpu.ops.correlation import local_correlation
from eemflow_tpu.ops.upsample import resize_bilinear
from eemflow_tpu.ops.warp import grid_sample_pixel


class FeatureExtractor(nn.Module):
    """Stride-2 conv pyramid, returned coarsest-first
    (reference pwc_modules.py:88-107)."""

    num_chs: Sequence[int] = (5, 16, 32, 64, 96, 128, 196)

    @nn.compact
    def __call__(self, x):
        pyramid = []
        for l, ch in enumerate(self.num_chs[1:]):
            x = ConvRelu(ch, stride=2, name=f"convs_{l}_0")(x)
            x = ConvRelu(ch, name=f"convs_{l}_1")(x)
            pyramid.append(x)
        return pyramid[::-1]


class FlowEstimatorDense(nn.Module):
    """Densely connected estimator (reference pwc_modules.py:157-175)."""

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate((128, 128, 96, 64, 32)):
            y = ConvRelu(f, name=f"conv{i + 1}")(x)
            x = jnp.concatenate([y, x], axis=-1)
        out = conv2d(2, 3, 1, name="conv_last_0")(x)
        return x, out


class ContextNetwork(nn.Module):
    """Dilated refinement (reference pwc_modules.py:212-228)."""

    out_ch: int = 2

    @nn.compact
    def __call__(self, x):
        cfg = [(128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1)]
        for i, (f, d) in enumerate(cfg):
            x = ConvRelu(f, dilation=d, name=f"convs_{i}")(x)
        return conv2d(self.out_ch, 3, 1, name="convs_6_0")(x)


def pwc_warp(x, flow, height_im, width_im, div_flow):
    """Reference WarpingLayer semantics in pixel coordinates: the flow is in
    input-image pixels × div_flow; scaled to the feature grid via the
    align_corners linspace grid (pwc_modules.py:110-136)."""
    B, H, W, C = x.shape
    gx = jnp.broadcast_to(jnp.arange(W, dtype=flow.dtype)[None, None, :], (B, H, W))
    gy = jnp.broadcast_to(jnp.arange(H, dtype=flow.dtype)[None, :, None], (B, H, W))
    sx = (W - 1) / max(width_im - 1, 1) / div_flow
    sy = (H - 1) / max(height_im - 1, 1) / div_flow
    px = gx + flow[..., 0] * sx
    py = gy + flow[..., 1] * sy
    out = grid_sample_pixel(x, px, py, align_corners=True)
    inb = (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
    return out * inb[..., None].astype(x.dtype)


def rescale_flow(flow, div_flow, width_im, height_im, to_local=True):
    """reference pwc_modules.py:151-155 (the mean!=0 guard is a no-op on
    values and not replicated)."""
    B, H, W, _ = flow.shape
    if to_local:
        scale = jnp.asarray(
            [W / width_im / div_flow, H / height_im / div_flow], flow.dtype
        )
    else:
        scale = jnp.asarray(
            [width_im * div_flow / W, height_im * div_flow / H], flow.dtype
        )
    return flow * scale


class PWCNet(nn.Module):
    """IRR-PWC. __call__(ev1, ev2) → ((ev1, ev2), flow list coarse→fine,
    each upsampled to input size and ÷div_flow)."""

    n_first_channels: int = 5
    div_flow: float = 0.05
    search_range: int = 4
    output_level: int = 4

    @nn.compact
    def __call__(self, events1, events2, train: bool = False):
        B, H, W, _ = events1.shape
        num_chs = (self.n_first_channels, 16, 32, 64, 96, 128, 196)
        fe = FeatureExtractor(num_chs, name="feature_pyramid_extractor")
        x1_pyr = fe(events1)
        x2_pyr = fe(events2)

        estimator = FlowEstimatorDense(name="flow_estimators")
        context = ContextNetwork(2, name="context_networks")
        conv1x1 = [
            ConvRelu(32, kernel_size=1, padding=0, name=f"conv_1x1_{l}")
            for l in range(5)
        ]

        flow = jnp.zeros(x1_pyr[0].shape[:3] + (2,), events1.dtype)
        preds = []
        for l, (x1, x2) in enumerate(zip(x1_pyr, x2_pyr)):
            if l == 0:
                x2_warp = x2
            else:
                flow = resize_bilinear(
                    flow, x1.shape[1:3], align_corners=True
                )
                x2_warp = pwc_warp(x2, flow, H, W, self.div_flow)

            corr = leaky_relu01(
                local_correlation(x1, x2_warp, self.search_range)
            )
            flow = rescale_flow(flow, self.div_flow, W, H, to_local=True)
            x1_1x1 = conv1x1[l](x1)
            x_intm, flow_res = estimator(
                jnp.concatenate([corr, x1_1x1, flow], axis=-1)
            )
            flow = flow + flow_res
            flow_fine = context(jnp.concatenate([x_intm, flow], axis=-1))
            flow = flow + flow_fine
            flow = rescale_flow(flow, self.div_flow, W, H, to_local=False)
            preds.append(
                resize_bilinear(flow, (H, W), align_corners=True)
                * (1.0 / self.div_flow)
            )
            if l == self.output_level:
                break

        return (events1, events2), preds
