"""Spiking flow networks (reference ``model/spikemodel/FlowNetS_spike.py``
and ``model/STEmodel/STEFlow.py``).

  * ``spike_fire`` — integrate-and-fire with straight-through surrogate
    gradient (reference ``SpikingNN``/``IF_Neuron``,
    ``spikemodel/FlowNetS_spike.py:9-33``): spikes where the over-threshold
    membrane exceeds 1e-5; gradient (1/threshold) passes only through firing
    positions.  Implemented as ``jax.custom_vjp``.
  * ``SpikeFlowNetS`` — accumulate-and-fire FlowNetS: 4 spiking stride-2
    conv stages integrate the event stream over time (a ``lax.scan``),
    total membrane potentials feed a FlowNetS decoder.
  * ``STEFlowNet`` — spatio-temporal recurrent variant (STE-FlowNet):
    per-level ConvGRUs over time groups, flow-warped local correlation
    against the first time step, 3 outer refinement passes; per-time flow
    states persist across passes.

Input: [B, H, W, C, T] event voxel stacks (NHWC + trailing time groups),
matching the reference's [B, C, H, W, T] contract.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.models.layers import Deconv as TorchDeconv
from eemflow_tpu.models.layers import conv2d, leaky_relu01
from eemflow_tpu.ops.correlation import local_correlation
from eemflow_tpu.ops.warp import backwarp_border


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def spike_fire(ex_membrane: jax.Array, threshold: float) -> jax.Array:
    """Binary spike from over-threshold membrane, straight-through grad."""
    return (ex_membrane > 1e-5).astype(ex_membrane.dtype)


def _spike_fwd(ex, threshold):
    return spike_fire(ex, threshold), ex


def _spike_bwd(threshold, ex, g):
    return (g * (1.0 / threshold) * (ex > 1e-5).astype(g.dtype),)


spike_fire.defvjp(_spike_fwd, _spike_bwd)


def if_neuron(membrane: jax.Array, threshold: float):
    """Integrate-and-fire step: hard reset + surrogate-grad spike
    (reference IF_Neuron semantics)."""
    ex = jnp.where(membrane > threshold, membrane, 0.0)
    membrane = membrane - ex
    return membrane, spike_fire(ex, threshold)


class _ConvLR(nn.Module):
    """conv + LeakyReLU(0.1) (spikemodel/util.py conv: bias=False;
    STEmodel/util.py conv: bias=True — batchNorm=False branches, the only
    constructible configuration upstream: the batchNorm deconvs normalize
    in_planes after producing out_planes, a latent crash)."""

    features: int
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        return leaky_relu01(
            conv2d(self.features, 3, self.stride, 1, use_bias=self.use_bias,
                   name="0")(x)
        )


class _ConvS(nn.Module):
    """plain conv, no activation (util.py conv_s; spiking current)."""

    features: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        return conv2d(self.features, 3, self.stride, 1, use_bias=False, name="0")(x)


class _Deconv(nn.Module):
    """deconv (util.py): torch-layout ConvTranspose(4,2,1) + LeakyReLU."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        return leaky_relu01(
            TorchDeconv(self.features, use_bias=self.use_bias, name="0")(x)
        )


def _upflow(features, name, use_bias=False):
    """bare ConvTranspose(in→32, 4, 2, 1) — the upsampled_flowX_to_Y heads."""
    return TorchDeconv(features, use_bias=use_bias, name=name)


class _PredictFlow(nn.Module):
    """predict_flow (util.py, batchNorm=False): Sequential(Conv2d 1×1)."""

    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        return conv2d(2, 1, 1, 0, use_bias=self.use_bias, name="0")(x)


def crop_like(a, b):
    return a[:, : b.shape[1], : b.shape[2], :]


class SpikeFlowNetS(nn.Module):
    """Accumulate-and-fire FlowNetS (reference spikemodel)."""

    sp_threshold: float = 0.75

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, H, W, 4, T] → (x, [flow [B, H/2, W/2, 2]])."""
        B, H, W, C, T = x.shape
        conv1 = _ConvS(64, name="conv1")
        conv2 = _ConvS(128, name="conv2")
        conv3 = _ConvS(256, name="conv3")
        conv4 = _ConvS(512, name="conv4")

        dims = [(H // 2, 64), (H // 4, 128), (H // 8, 256), (H // 16, 512)]
        w_dims = [W // 2, W // 4, W // 8, W // 16]
        mems = [
            jnp.zeros((B, h, w, c), x.dtype)
            for (h, c), w in zip(dims, w_dims)
        ]
        tots = [jnp.zeros_like(m) for m in mems]

        th = self.sp_threshold
        for t in range(T):
            inp = x[..., t]
            cur1 = conv1(inp)
            mems[0] = mems[0] + cur1
            tots[0] = tots[0] + cur1
            mems[0], s1 = if_neuron(mems[0], th)
            cur2 = conv2(s1)
            mems[1] = mems[1] + cur2
            tots[1] = tots[1] + cur2
            mems[1], s2 = if_neuron(mems[1], th)
            cur3 = conv3(s2)
            mems[2] = mems[2] + cur3
            tots[2] = tots[2] + cur3
            mems[2], s3 = if_neuron(mems[2], th)
            cur4 = conv4(s3)
            mems[3] = mems[3] + cur4
            tots[3] = tots[3] + cur4
            mems[3], _ = if_neuron(mems[3], th)

        out_conv1, out_conv2, out_conv3, out_conv4 = tots

        r11 = _ConvLR(512, 1, name="conv_r11")(out_conv4)
        r12 = _ConvLR(512, 1, name="conv_r12")(r11) + out_conv4
        r21 = _ConvLR(512, 1, name="conv_r21")(r12)
        r22 = _ConvLR(512, 1, name="conv_r22")(r21) + r12

        def predict(feat, name):
            return _PredictFlow(use_bias=False, name=name)(feat)

        flow4 = predict(_upflow(32, "upsampled_flow4_to_3")(r22), "predict_flow4")
        flow4_up = crop_like(flow4, out_conv3)
        d3 = crop_like(_Deconv(128, name="deconv3")(r22), out_conv3)

        concat3 = jnp.concatenate([out_conv3, d3, flow4_up], axis=-1)
        flow3 = predict(_upflow(32, "upsampled_flow3_to_2")(concat3), "predict_flow3")
        flow3_up = crop_like(flow3, out_conv2)
        d2 = crop_like(_Deconv(64, name="deconv2")(concat3), out_conv2)

        concat2 = jnp.concatenate([out_conv2, d2, flow3_up], axis=-1)
        flow2 = predict(_upflow(32, "upsampled_flow2_to_1")(concat2), "predict_flow2")
        flow2_up = crop_like(flow2, out_conv1)
        d1 = crop_like(_Deconv(4, name="deconv1")(concat2), out_conv1)

        concat1 = jnp.concatenate([out_conv1, d1, flow2_up], axis=-1)
        flow1 = predict(_upflow(32, "upsampled_flow1_to_0")(concat1), "predict_flow1")

        return x, [flow1]


class _ConvGRU(nn.Module):
    hidden_dim: int

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(conv2d(self.hidden_dim, 3, 1, 1, name="convz")(hx))
        r = nn.sigmoid(conv2d(self.hidden_dim, 3, 1, 1, name="convr")(hx))
        q = nn.tanh(
            conv2d(self.hidden_dim, 3, 1, 1, name="convq")(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        return (1 - z) * h + z * q


class STEFlowNet(nn.Module):
    """STE-FlowNet: recurrent spatio-temporal refinement
    (reference STEmodel/STEFlow.py:75-280, simplified to the live code
    path: 4 GRU levels, flow-warped 9×9 correlation vs the first time
    step, 3 outer passes, residual multi-scale flow predictions)."""

    num_iterative: int = 3
    md: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, H, W, C>=2, T] (first 2 channels used per time group)."""
        B, H, W, C, T = x.shape
        nd = (2 * self.md + 1) ** 2

        # STEmodel/util.py convs carry bias=True (batchNorm=False branch)
        conv1 = _ConvLR(64, 2, use_bias=True, name="conv1")
        conv2 = _ConvLR(128, 2, use_bias=True, name="conv2")
        conv3 = _ConvLR(256, 2, use_bias=True, name="conv3")
        conv4 = _ConvLR(512, 2, use_bias=True, name="conv4")
        conv2_2 = _ConvLR(128, 2, use_bias=True, name="conv2_2")
        conv3_2 = _ConvLR(256, 2, use_bias=True, name="conv3_2")
        conv4_2 = _ConvLR(512, 2, use_bias=True, name="conv4_2")

        gru1 = _ConvGRU(64 + nd, name="gru_update1")
        gru2 = _ConvGRU(128 + nd, name="gru_update2")
        gru3 = _ConvGRU(256 + nd, name="gru_update3")
        gru4 = _ConvGRU(512 + nd, name="gru_update4")

        r00 = _ConvLR(512, 1, use_bias=True, name="conv_r00")
        r11 = _ConvLR(512, 1, use_bias=True, name="conv_r11")
        r12 = _ConvLR(512, 1, use_bias=True, name="conv_r12")
        r21 = _ConvLR(512, 1, use_bias=True, name="conv_r21")
        r22 = _ConvLR(512, 1, use_bias=True, name="conv_r22")

        deconv3 = _Deconv(128, use_bias=True, name="deconv3")
        deconv2 = _Deconv(64, use_bias=True, name="deconv2")
        deconv1 = _Deconv(4, use_bias=True, name="deconv1")

        up4 = _upflow(32, "upsampled_flow4_to_3", use_bias=True)
        up3 = _upflow(32, "upsampled_flow3_to_2", use_bias=True)
        up2 = _upflow(32, "upsampled_flow2_to_1", use_bias=True)
        up1 = _upflow(32, "upsampled_flow1_to_0", use_bias=True)

        predict_heads = {
            name: _PredictFlow(use_bias=True, name=name)
            for name in ("predict_flow4", "predict_flow3", "predict_flow2",
                         "predict_flow1")
        }

        def predict(feat, name):
            return predict_heads[name](feat)

        h2, h4, h8, h16 = H // 2, H // 4, H // 8, H // 16
        w2, w4, w8, w16 = W // 2, W // 4, W // 8, W // 16
        net1 = jnp.zeros((B, h2, w2, 64 + nd), x.dtype)
        net2 = jnp.zeros((B, h4, w4, 128 + nd), x.dtype)
        net3 = jnp.zeros((B, h8, w8, 256 + nd), x.dtype)
        net4 = jnp.zeros((B, h16, w16, 512 + nd), x.dtype)

        flow1_all = [jnp.zeros((B, H, W, 2), x.dtype) for _ in range(T)]
        flow2_all = [jnp.zeros((B, h2, w2, 2), x.dtype) for _ in range(T)]
        flow3_all = [jnp.zeros((B, h4, w4, 2), x.dtype) for _ in range(T)]
        flow4_all = [jnp.zeros((B, h8, w8, 2), x.dtype) for _ in range(T)]

        f1_first = f2_first = f3_first = f4_first = None
        preds = []
        for _ in range(self.num_iterative):
            for t in range(T):
                inp = x[:, :, :, 0:2, t]
                c1 = conv1(inp)
                if f1_first is None or t == 0:
                    f1_first = c1
                warp1 = backwarp_border(c1, flow2_all[t])
                # corr() applies LeakyReLU internally AND the forward applies
                # leakyRELU again (STEmodel/corr.py:26 + STEFlow.py:201) —
                # a double leaky: negatives scale by 0.01
                corr1 = leaky_relu01(leaky_relu01(
                    local_correlation(f1_first, warp1, self.md)))
                net1 = gru1(net1, jnp.concatenate([c1, corr1], axis=-1))

                c2 = conv2(net1)
                c2_1 = conv2_2(c1)
                if t == 0:
                    f2_first = c2_1
                warp2 = backwarp_border(c2_1, flow3_all[t])
                corr2 = leaky_relu01(leaky_relu01(
                    local_correlation(f2_first, warp2, self.md)))
                net2 = gru2(net2, jnp.concatenate([c2, corr2], axis=-1))

                c3 = conv3(net2)
                c3_1 = conv3_2(c2_1)
                if t == 0:
                    f3_first = c3_1
                warp3 = backwarp_border(c3_1, flow4_all[t])
                corr3 = leaky_relu01(leaky_relu01(
                    local_correlation(f3_first, warp3, self.md)))
                net3 = gru3(net3, jnp.concatenate([c3, corr3], axis=-1))

                c4 = conv4(net3)
                c4_1 = conv4_2(c3_1)
                if t == 0:
                    f4_first = c4_1
                corr4 = leaky_relu01(leaky_relu01(
                    local_correlation(f4_first, c4_1, self.md)))
                net4 = gru4(net4, jnp.concatenate([c4, corr4], axis=-1))

                o00 = r00(net4)
                o12 = r12(r11(o00)) + o00
                o22 = r22(r21(o12)) + o12

                concat4 = jnp.concatenate([net4, o22], axis=-1)
                flow4 = predict(up4(concat4), "predict_flow4") + flow4_all[t]
                flow4_all[t] = flow4
                d3 = deconv3(concat4)

                concat3 = jnp.concatenate([net3, d3, flow4], axis=-1)
                flow3 = predict(up3(concat3), "predict_flow3") + flow3_all[t]
                flow3_all[t] = flow3
                d2 = deconv2(concat3)

                concat2 = jnp.concatenate([net2, d2, flow3], axis=-1)
                flow2 = predict(up2(concat2), "predict_flow2") + flow2_all[t]
                flow2_all[t] = flow2
                d1 = deconv1(concat2)

                concat1 = jnp.concatenate([net1, d1, flow2], axis=-1)
                flow1 = predict(up1(concat1), "predict_flow1") + flow1_all[t]
                flow1_all[t] = flow1
            # one prediction per outer pass (reference STEFlow.py:257)
            preds.append(flow1)

        return x, preds
