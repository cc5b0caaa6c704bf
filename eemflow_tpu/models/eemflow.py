"""EEMFlow — the paper's efficient meshflow/optical-flow network.

Architecture (reference ``model/EEMFlow/EEMFlow.py:71-183``):
  * 3-stage stride-2 conv pyramid (n_bins→16→32→64, LeakyReLU 0.1),
  * aggressive average pooling of each level to a ~mesh-resolution grid
    (pool 32/16/8 — *the* efficiency trick: correlation runs at ≤40×23),
  * per-level 81-channel local correlation sparsified by a fixed channel
    ``index_select``, fused here directly into the correlation kernel,
  * three ShuffleNet-style grouped-conv decoders + 1×1 fusion,
  * single bilinear upsampled flow prediction (align_corners=False).

Known reference inconsistency (documented, not replicated): the shipped
49-element index at ``EEMFlow.py:85-94`` yields 49+16=65 decoder input
channels, but the decoders are built with 69 (``EEMFlow.py:100-102``) — the
model as committed would fail at its first decoder call.  The 53-element
diamond mask from EEMFlow+ (``EEMFlow+.py:89-97``) gives exactly 53+16=69,
so we default to it; ``corr_indices`` is configurable for checkpoint
compatibility.

TPU design notes: NHWC layout, correlation computes only the selected
channels (no 81→53 materialize-then-select), all shapes static under jit.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.layers import ConvRelu, channel_shuffle, conv2d
from eemflow_tpu.ops.correlation import local_correlation
from eemflow_tpu.ops.pad import InputPadder
from eemflow_tpu.ops.pooling import avg_pool2d
from eemflow_tpu.ops.upsample import upsample_flow_to

# Stale 49-channel mask as committed in the reference (EEMFlow.py:85-94);
# kept for documentation / potential checkpoint variants.
INDEX_49 = (
    1, 3, 5, 7,
    9, 11, 13, 15, 17,
    19, 21, 22, 23, 25,
    27, 29, 30, 31, 32, 33, 35,
    37, 38, 39, 40, 41, 42, 43,
    45, 47, 48, 49, 50, 51, 53,
    55, 57, 58, 59, 61,
    63, 65, 67, 69, 71,
    73, 75, 77, 79,
)

# 53-channel diamond mask (EEMFlow+.py:89-97) — consistent with Decoder(69).
INDEX_53 = (
    0, 2, 4, 6, 8,
    10, 12, 14, 16,
    18, 20, 21, 22, 23, 24, 26,
    28, 29, 30, 31, 32, 33, 34,
    36, 38, 39, 40, 41, 42, 44,
    46, 47, 48, 49, 50, 51, 52,
    54, 56, 57, 58, 59, 60, 62,
    64, 66, 68, 70,
    72, 74, 76, 78, 80,
)


class Decoder(nn.Module):
    """7-conv flow decoder with grouped convs + channel shuffle
    (reference ``EEMFlow.py:37-69``)."""

    groups: int
    mid: int = 100

    @nn.compact
    def __call__(self, x):
        g = self.groups
        x = ConvRelu(self.mid, name="conv1")(x)
        if g == 1:
            x = ConvRelu(self.mid, name="conv2")(x)
            x = ConvRelu(self.mid, name="conv3")(x)
            x = ConvRelu(self.mid, name="conv4")(x)
        else:
            x = channel_shuffle(ConvRelu(self.mid, groups=g, name="conv2")(x), g)
            x = channel_shuffle(ConvRelu(self.mid, groups=g, name="conv3")(x), g)
            x = channel_shuffle(ConvRelu(self.mid, groups=g, name="conv4")(x), g)
        x = ConvRelu(64, name="conv5")(x)
        x = ConvRelu(32, name="conv6")(x)
        return conv2d(2, 3, 1, name="conv7")(x)


class _S2DConv(nn.Module):
    """3×3 stride-2 conv executed as space-to-depth + 2×2 conv.

    TPU throughput trick: the full-resolution stem conv underfills the
    128-lane MXU (C_in = n_bins ≤ 5); folding 2×2 pixel cells into channels
    (4× C_in, ¼ positions) runs the SAME math ~1.3× faster (measured, v5e).
    Params keep the standard 3×3 layout ('kernel' [3,3,Cin,Cout]) so
    checkpoints are bit-compatible; the 2×2×4Cin kernel is rebuilt in-call
    (a tiny static scatter XLA hoists out of the hot path).  Exact to fp
    noise (~5e-7, tested in tests/test_eemflow_model.py)."""

    features: int

    @nn.compact
    def __call__(self, x):
        from eemflow_tpu.models.layers import kaiming_in

        B, H, W, Cin = x.shape
        kernel = self.param(
            "kernel", kaiming_in, (3, 3, Cin, self.features), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        # space-to-depth: 2×2 cells → channels, sub-position-major
        xs = x.reshape(B, H // 2, 2, W // 2, 2, Cin)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * Cin)
        # scatter the 9 taps of the 3×3 s2 kernel into 2×2 cells:
        # tap offset d∈{-1,0,1} lives in cell 0 (sub 1) for d=-1, else cell 1
        # (sub d); kernel spatial pos (0,1) ↔ cells (y-1, y) with pad (1,0)
        w4 = jnp.zeros((2, 2, 4 * Cin, self.features), kernel.dtype)
        for dy in (-1, 0, 1):
            cy, ry = (0, 1) if dy == -1 else (1, dy)
            for dx in (-1, 0, 1):
                cx, rx = (0, 1) if dx == -1 else (1, dx)
                blk = (ry * 2 + rx) * Cin
                w4 = w4.at[cy, cx, blk : blk + Cin, :].add(kernel[dy + 1, dx + 1])
        y = jax.lax.conv_general_dilated(
            xs, w4.astype(x.dtype), (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(y.dtype)


class _S2DStem(nn.Module):
    """conv('0') + LeakyReLU wrapper matching ConvRelu's param tree."""

    features: int

    @nn.compact
    def __call__(self, x):
        from eemflow_tpu.models.layers import leaky_relu01

        return leaky_relu01(_S2DConv(self.features, name="0")(x))


class Pyramid(nn.Module):
    """Shared 3-stage stride-2 feature pyramid (reference EEMFlow.py:75-82).

    ``s2d_stem``: run the full-resolution stem conv (pconv1_1) as
    space-to-depth + 2×2 conv — exact reparameterization of the same
    weights.  1.3× faster in isolation but slower end-to-end (see
    EEMFlow.s2d_stem note); off by default."""

    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x):
        if self.s2d_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            stem = _S2DStem(16, name="pconv1_1")
        else:
            stem = ConvRelu(16, stride=2, name="pconv1_1")
        f1 = ConvRelu(16, name="pconv1_2")(stem(x))
        f2 = ConvRelu(32, name="pconv2_3")(
            ConvRelu(32, name="pconv2_2")(ConvRelu(32, stride=2, name="pconv2_1")(f1))
        )
        f3 = ConvRelu(64, name="pconv3_3")(
            ConvRelu(64, name="pconv3_2")(ConvRelu(64, stride=2, name="pconv3_1")(f2))
        )
        return f1, f2, f3


class EEMFlow(nn.Module):
    """Flagship model.  __call__(ev1, ev2 [B,H,W,bins]) →
    ((ev1, ev2), [flow [B,H,W,2]]) matching the reference contract.

    ``fast_head``: serving mode — runs the entire coarse stage (3×local
    correlation, 3×rconv, 3×7-conv decoder, 1×1 fuse) as ONE fused Pallas
    kernel (``ops/pallas/coarse_head.py``).  Same params, same math in
    f32 (parity to fp noise, model-level tolerance test); eval-only —
    training and init take the standard path.  ``fast_head_impl="xla"``
    selects the pure-jnp twin of the fused math (measurement control).
    """

    groups: int = 5
    n_first_channels: int = 5
    out_mesh_size: bool = False
    corr_indices: Sequence[int] = INDEX_53
    max_displacement: int = 4
    pad_rate: int = 64
    # space-to-depth stem: exact reparam, ~1.3× on the ISOLATED stem conv,
    # but measured SLOWER end-to-end (975→631 fps @720p — XLA layout
    # interactions eat the win); kept as an opt-in documented experiment
    s2d_stem: bool = False
    fast_head: bool = False
    fast_head_impl: str = "pallas"
    # serving mode for the pyramid body: stride-1 convs + pool of each
    # level fused into one Pallas pass (ops/pallas/fused_convs.py); the
    # stride-2 convs stay XLA convs.  dtype "bfloat16" additionally casts
    # the conv matmul operands (fp32 accumulation) — tolerance-tested.
    fast_pyramid: bool = False
    fast_pyramid_dtype: str = "float32"
    # Round-4 graph-restructure levers (exact math, op-level — NOT Pallas
    # hand-fusion, which lost on hardware; docs/PERF.md ledger):
    #   siamese_stack — run BOTH event frames through the pyramid+pools as
    #     one 2B-batch call (convs/pools are batch-parallel → per-frame
    #     results identical); halves the full-resolution op count and the
    #     layout transitions between conv fusions.
    #   stacked_coarse — the 3 rconvs and the 3 seven-conv decoders all see
    #     same-spatial [B, H/32, W/32, ·] grids; express each conv triple as
    #     ONE grouped conv (groups 3 / 3·groups) over channel-stacked
    #     inputs, reading the SAME per-decoder params (weights concatenated
    #     in-call along the output-channel axis — checkpoints unchanged).
    #     Eval-only, like fast_head.
    siamese_stack: bool = False
    stacked_coarse: bool = False

    def setup(self):
        self.pyramid = Pyramid(s2d_stem=self.s2d_stem)
        self.rconv_1 = ConvRelu(16)
        self.rconv_2 = ConvRelu(16)
        self.rconv_3 = ConvRelu(16)
        self.decoder_1 = Decoder(self.groups)
        self.decoder_2 = Decoder(self.groups)
        self.decoder_3 = Decoder(self.groups)
        self.out_conv = conv2d(2, kernel_size=1, padding=0)

    def _fast_pyramid(self, ev):
        """Serving pyramid: XLA stride-2 convs + fused Pallas
        stride-1-convs+pool per level (ops/pallas/fused_convs.py).
        Reads the SAME params as ``self.pyramid`` — checkpoints load
        either way; only pooled grids are produced (the full-res level
        outputs feed nothing else in EEMFlow's forward)."""
        from eemflow_tpu.models.layers import leaky_relu01
        from eemflow_tpu.ops.pallas.fused_convs import fused_convs_pool

        pp = self.variables["params"]["pyramid"]
        cdt = (
            jnp.bfloat16
            if self.fast_pyramid_dtype in ("bf16", "bfloat16")
            else jnp.float32
        )

        def s2(x, p):
            w = jnp.asarray(p["0"]["kernel"], x.dtype)
            b = jnp.asarray(p["0"]["bias"], x.dtype)
            y = jax.lax.conv_general_dilated(
                x, w, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return leaky_relu01(y + b)

        def kb(names):
            ks = [pp[n]["0"]["kernel"] for n in names]
            bs = [pp[n]["0"]["bias"] for n in names]
            return ks, bs

        # always tap-accumulation: the im2col X9 concat is a minor-dim
        # vector concat Mosaic cannot lower at these offsets ("result/input
        # offset mismatch on non-concat dimension", measured on v5e), and
        # X9 alone is ~12 MB at the 720p level-1 grid anyway
        var = lambda x: "taps"
        g1 = s2(ev, pp["pconv1_1"])
        f11, p1 = fused_convs_pool(
            g1, *kb(["pconv1_2"]), pool=32, compute_dtype=cdt,
            variant=var(g1),
        )
        g2 = s2(f11, pp["pconv2_1"])
        f12, p2 = fused_convs_pool(
            g2, *kb(["pconv2_2", "pconv2_3"]), pool=16, compute_dtype=cdt,
            variant=var(g2),
        )
        g3 = s2(f12, pp["pconv3_1"])
        _, p3 = fused_convs_pool(
            g3, *kb(["pconv3_2", "pconv3_3"]), pool=8, compute_dtype=cdt,
            emit_full=False, variant=var(g3),
        )
        return p1, p2, p3

    def _stacked_coarse(self, f1s, f2s, idx, md):
        """Coarse stage with the 3 per-level conv stacks expressed as single
        grouped convs over channel-concatenated inputs (all three pooled
        grids share the same H/32×W/32 spatial shape).  Reads the standard
        per-decoder params and concatenates weights along the output-channel
        axis in-call, so checkpoints load unchanged.  Math is exact up to
        fp reassociation (tolerance-tested)."""
        from eemflow_tpu.models.layers import leaky_relu01

        p = self.variables["params"]
        g = self.groups
        Cs = [f.shape[-1] for f in f1s]
        Cmax = max(Cs)

        def gconv(x, w, b, groups):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                feature_group_count=groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + b

        # --- the 3 rconvs as one groups=3 conv (inputs zero-padded to a
        # common 64-ch group width; pad rows of the kernels are zero) ---
        xr = jnp.concatenate(
            [
                jnp.pad(f, ((0, 0), (0, 0), (0, 0), (0, Cmax - f.shape[-1])))
                for f in f1s
            ],
            axis=-1,
        )
        wr = jnp.concatenate(
            [
                jnp.pad(
                    p[f"rconv_{i + 1}"]["0"]["kernel"],
                    ((0, 0), (0, 0), (0, Cmax - Cs[i]), (0, 0)),
                )
                for i in range(3)
            ],
            axis=-1,
        )
        br = jnp.concatenate(
            [p[f"rconv_{i + 1}"]["0"]["bias"] for i in range(3)]
        )
        r = leaky_relu01(gconv(xr, wr, br, 3))  # [B, Hc, Wc, 48]

        # --- correlation per level (24×40-scale, cheap), then one stacked
        # decoder input [cv_1 | r_1 | cv_2 | r_2 | cv_3 | r_3] ---
        cvs = [
            local_correlation(f1s[i], f2s[i], md, indices=idx)
            for i in range(3)
        ]
        x = jnp.concatenate(
            [cvs[0], r[..., 0:16], cvs[1], r[..., 16:32], cvs[2], r[..., 32:48]],
            axis=-1,
        )

        def dk(name):
            w = jnp.concatenate(
                [p[f"decoder_{i + 1}"][name]["0"]["kernel"] for i in range(3)],
                axis=-1,
            )
            b = jnp.concatenate(
                [p[f"decoder_{i + 1}"][name]["0"]["bias"] for i in range(3)]
            )
            return w, b

        def shuffle3(x):
            # per-decoder channel_shuffle(·, g) on the 3×100 stacked channels
            B_, H_, W_, C_ = x.shape
            cpd = C_ // 3
            xs = x.reshape(B_, H_, W_, 3, g, cpd // g)
            xs = jnp.swapaxes(xs, -1, -2)
            return xs.reshape(B_, H_, W_, C_)

        x = leaky_relu01(gconv(x, *dk("conv1"), 3))
        inner_g = 3 * g if g > 1 else 3
        for name in ("conv2", "conv3", "conv4"):
            x = leaky_relu01(gconv(x, *dk(name), inner_g))
            if g > 1:
                x = shuffle3(x)
        x = leaky_relu01(gconv(x, *dk("conv5"), 3))
        x = leaky_relu01(gconv(x, *dk("conv6"), 3))
        w7 = jnp.concatenate(
            [p[f"decoder_{i + 1}"]["conv7"]["kernel"] for i in range(3)],
            axis=-1,
        )
        b7 = jnp.concatenate(
            [p[f"decoder_{i + 1}"]["conv7"]["bias"] for i in range(3)]
        )
        flow_concat = gconv(x, w7, b7, 3)  # [B, Hc, Wc, 6] = flow_1|2|3
        return self.out_conv(flow_concat)

    def __call__(self, events1, events2, train: bool = False):
        B, H, W, _ = events1.shape
        out_size = (16, 16) if (train and self.out_mesh_size) else (H, W)

        padder = InputPadder((H, W), mode="chairs", eval_pad_rate=self.pad_rate)
        ev1, ev2 = padder.pad(events1, events2)

        if self.fast_pyramid and not train and not self.is_initializing():
            f14_1, f14_2, f14_3 = self._fast_pyramid(ev1)
            f24_1, f24_2, f24_3 = self._fast_pyramid(ev2)
        elif self.siamese_stack and not self.is_initializing():
            ev = jnp.concatenate([ev1, ev2], axis=0)
            f1, f2, f3 = self.pyramid(ev)
            p1, p2, p3 = avg_pool2d(f1, 32), avg_pool2d(f2, 16), avg_pool2d(f3, 8)
            f14_1, f24_1 = p1[:B], p1[B:]
            f14_2, f24_2 = p2[:B], p2[B:]
            f14_3, f24_3 = p3[:B], p3[B:]
        else:
            f11, f12, f13 = self.pyramid(ev1)
            f21, f22, f23 = self.pyramid(ev2)

            # pool each level to the coarse correlation grid (32/16/8)
            f14_1, f24_1 = avg_pool2d(f11, 32), avg_pool2d(f21, 32)
            f14_2, f24_2 = avg_pool2d(f12, 16), avg_pool2d(f22, 16)
            f14_3, f24_3 = avg_pool2d(f13, 8), avg_pool2d(f23, 8)

        idx = tuple(self.corr_indices)
        md = self.max_displacement

        if self.fast_head and not train and not self.is_initializing():
            from eemflow_tpu.ops.pallas.coarse_head import coarse_head

            out = coarse_head(
                (f14_1, f14_2, f14_3),
                (f24_1, f24_2, f24_3),
                self.variables["params"],
                groups=self.groups,
                indices=idx,
                max_displacement=md,
                impl=self.fast_head_impl,
            )
            return (events1, events2), [upsample_flow_to(out, out_size)]

        if self.stacked_coarse and not train and not self.is_initializing():
            out = self._stacked_coarse(
                (f14_1, f14_2, f14_3), (f24_1, f24_2, f24_3), idx, md
            )
            return (events1, events2), [upsample_flow_to(out, out_size)]

        cv_1 = local_correlation(f14_1, f24_1, md, indices=idx)
        r_1 = self.rconv_1(f14_1)
        flow_1 = self.decoder_1(jnp.concatenate([cv_1, r_1], axis=-1))

        cv_2 = local_correlation(f14_2, f24_2, md, indices=idx)
        r_2 = self.rconv_2(f14_2)
        flow_2 = self.decoder_2(jnp.concatenate([cv_2, r_2], axis=-1))

        cv_3 = local_correlation(f14_3, f24_3, md, indices=idx)
        r_3 = self.rconv_3(f14_3)
        flow_3 = self.decoder_3(jnp.concatenate([cv_3, r_3], axis=-1))

        flow_concat = jnp.concatenate([flow_1, flow_2, flow_3], axis=-1)
        out = self.out_conv(flow_concat)
        flow_up = upsample_flow_to(out, out_size)

        return (events1, events2), [flow_up]
