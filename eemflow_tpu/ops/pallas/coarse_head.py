"""Fused EEMFlow coarse head — correlation + decoders as ONE Pallas kernel.

Motivation (docs/PERF.md "Where EEMFlow's time goes"): at 720×1280 the
coarse stage — three local correlations, three rconvs, three 7-conv
decoders and the 1×1 fusion, all on 12×20 grids — carries ~2 GFLOP yet
costs ~4.6 of the 9.6 ms dispatch: every op is a lane-underfilled tensor
with XLA relayouts between them.  Everything (activations ≤ 240×128,
weights ~6 MB f32) fits in VMEM, so the whole stage fuses into a single
kernel with no HBM round-trips:

  * 3×3 convs are im2col matmuls: 9 static shifted slices concatenated
    along channels, then one (h·w, 9·Cin) @ (9·Cin, Cout) MXU dot;
  * grouped convs (reference ``EEMFlow.py:37-69`` Decoder, groups=5)
    become dense block-diagonal matrices — the MXU is idle at these
    sizes, correctness over cleverness;
  * the ShuffleNet channel shuffle is folded into the NEXT conv's
    input-channel permutation (shuffle(x)·W == x·W[σ⁻¹]), so it costs
    nothing at run time;
  * the 53-channel sparsified local correlation
    (reference ``EEMFlow.py:14-23`` + ``EEMFlow+.py:89-97`` mask) is a
    VPU multiply + lane-reduction per selected displacement;
  * the final ``out_conv`` 1×1 fuse runs in-kernel on (h·w, 6).

Semantics are exactly the standard path in ``models/eemflow.py`` (same
params, f32 math); only the summation order differs (im2col dot vs XLA
conv), so parity is to fp noise.  ``coarse_head(..., impl="xla")`` runs
the identical math as plain jnp under vmap — the golden twin for tests
and the measurement control.

Eval-only serving optimisation: gradients are not defined through the
pallas path (eval consumes no grads); training keeps the standard path.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fixed per-level weight ordering inside the flat pallas arg list
_LEVEL_KEYS = (
    "wr", "br", "w1", "b1", "w2", "b2", "w3", "b3",
    "w4", "b4", "w5", "b5", "w6", "b6", "w7", "b7",
)


def _tap_flatten(kernel: jax.Array) -> jax.Array:
    """(3,3,Cin,Cout) HWIO kernel → (9·Cin, Cout), tap-major row-major —
    matching the im2col column order built in `_conv3x3`."""
    kh, kw, cin, cout = kernel.shape
    return kernel.reshape(kh * kw * cin, cout)


def _dense_from_grouped(kernel: jax.Array, groups: int, cin: int) -> jax.Array:
    """Grouped-conv kernel (3,3,Cin/g,Cout) → dense (3,3,Cin,Cout) with the
    block-diagonal structure made explicit (zeros off the blocks)."""
    kh, kw, cpg, cout = kernel.shape
    opg = cout // groups
    dense = jnp.zeros((kh, kw, cin, cout), kernel.dtype)
    for g in range(groups):
        dense = dense.at[
            :, :, g * cpg : (g + 1) * cpg, g * opg : (g + 1) * opg
        ].set(kernel[:, :, :, g * opg : (g + 1) * opg])
    return dense


def _fold_shuffle(kernel: jax.Array, groups: int) -> jax.Array:
    """Fold a preceding channel_shuffle into this conv's input channels.

    channel_shuffle (models/layers.py:115): out[i] = in[σ(i)] with
    σ(i) = (i % g)·(C/g) + i//g.  conv(shuffle(x)) == conv'(x) where
    conv' takes input channel j from original row σ⁻¹(j) =
    (j % (C/g))·g + j//(C/g)."""
    cin = kernel.shape[2]
    cpg = cin // groups
    j = np.arange(cin)
    sigma_inv = (j % cpg) * groups + j // cpg
    return kernel[:, :, sigma_inv, :]


def decoder_dense_kernels(
    dec: Dict, groups: int
) -> Tuple[List[jax.Array], List[jax.Array], Tuple[bool, ...]]:
    """An EEMFlow/EEMFlow+ ``Decoder`` param tree → a plain 7-conv chain.

    Returns (HWIO dense 3×3 kernels, biases, relu flags) consumable by
    ``fused_convs.fused_convs_pool``: grouped convs dense-ified
    block-diagonal, the channel shuffles folded into the next conv's
    input-channel permutation, conv7 linear."""
    f32 = lambda a: jnp.asarray(a, jnp.float32)

    def cr(name):
        return f32(dec[name]["0"]["kernel"]), f32(dec[name]["0"]["bias"])

    k1, b1 = cr("conv1")
    mid = b1.shape[0]
    ks, bs = [k1], [b1]
    for i, fold in ((2, False), (3, True), (4, True)):
        k, b = cr(f"conv{i}")
        if groups != 1:
            k = _dense_from_grouped(k, groups, mid)
            if fold:
                k = _fold_shuffle(k, groups)
        ks.append(k)
        bs.append(b)
    k5, b5 = cr("conv5")
    if groups != 1:
        k5 = _fold_shuffle(k5, groups)
    k6, b6 = cr("conv6")
    ks += [k5, k6, f32(dec["conv7"]["kernel"])]
    bs += [b5, b6, f32(dec["conv7"]["bias"])]
    return ks, bs, (True,) * 6 + (False,)


def pack_coarse_head_weights(
    params: Dict, groups: int
) -> Tuple[List[Dict[str, jax.Array]], jax.Array, jax.Array]:
    """Flatten EEMFlow's rconv/decoder/out_conv params into matmul form.

    `params` is the model's own param tree (keys rconv_1..3, decoder_1..3,
    out_conv).  Returns (per-level dicts keyed by _LEVEL_KEYS, wout, bout).
    All tiny reshapes/permutes — XLA hoists or executes them in µs.
    """
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    levels = []
    for l in (1, 2, 3):
        rk = params[f"rconv_{l}"]["0"]
        dec = params[f"decoder_{l}"]
        d = {
            "wr": _tap_flatten(f32(rk["kernel"])),
            "br": f32(rk["bias"]).reshape(1, -1),
        }

        def cr(name):  # ConvRelu param leaf
            return f32(dec[name]["0"]["kernel"]), f32(dec[name]["0"]["bias"])

        k1, b1 = cr("conv1")
        d["w1"], d["b1"] = _tap_flatten(k1), b1.reshape(1, -1)
        if groups == 1:
            for i in (2, 3, 4):
                k, b = cr(f"conv{i}")
                d[f"w{i}"], d[f"b{i}"] = _tap_flatten(k), b.reshape(1, -1)
            k5, b5 = cr("conv5")
            d["w5"] = _tap_flatten(k5)
        else:
            mid = b1.shape[0]
            k2, b2 = cr("conv2")
            d["w2"] = _tap_flatten(_dense_from_grouped(k2, groups, mid))
            d["b2"] = b2.reshape(1, -1)
            # conv3/conv4 consume shuffled activations → fold the perm
            k3, b3 = cr("conv3")
            d["w3"] = _tap_flatten(
                _fold_shuffle(_dense_from_grouped(k3, groups, mid), groups)
            )
            d["b3"] = b3.reshape(1, -1)
            k4, b4 = cr("conv4")
            d["w4"] = _tap_flatten(
                _fold_shuffle(_dense_from_grouped(k4, groups, mid), groups)
            )
            d["b4"] = b4.reshape(1, -1)
            k5, b5 = cr("conv5")
            d["w5"] = _tap_flatten(_fold_shuffle(k5, groups))
        d["b5"] = b5.reshape(1, -1)
        k6, b6 = cr("conv6")
        d["w6"], d["b6"] = _tap_flatten(k6), b6.reshape(1, -1)
        k7 = f32(dec["conv7"]["kernel"])
        d["w7"] = _tap_flatten(k7)
        d["b7"] = f32(dec["conv7"]["bias"]).reshape(1, -1)
        levels.append(d)
    wout = f32(params["out_conv"]["kernel"]).reshape(6, 2)
    bout = f32(params["out_conv"]["bias"]).reshape(1, 2)
    return levels, wout, bout


def _lrelu(x):
    return jnp.where(x > 0, x, 0.1 * x)


def _conv3x3(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """x (h,w,Cin), w (9·Cin, Cout), b (1, Cout) → (h,w,Cout); zero pad.

    Tap accumulation (9 dots on the per-tap weight rows) rather than an
    im2col concat: Mosaic cannot lower the 9-way channel concatenate at
    these offsets ("result/input offset mismatch on non-concat
    dimension"), and the taps form needs no X9 materialisation anyway.
    """
    h, wd, cin = x.shape
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    y = b * jnp.ones((h * wd, 1), jnp.float32)
    for t, (dy, dx) in enumerate(
        (a, c) for a in range(3) for c in range(3)
    ):
        xt = jax.lax.slice(
            xp, (dy, dx, 0), (dy + h, dx + wd, cin)
        ).reshape(h * wd, cin)
        y = y + jnp.dot(
            xt, w[t * cin : (t + 1) * cin],
            preferred_element_type=jnp.float32,
        )
    return y.reshape(h, wd, w.shape[1])


def _level_flow(
    f1: jax.Array,
    f2: jax.Array,
    wts: Dict[str, jax.Array],
    indices: Tuple[int, ...],
    md: int,
) -> jax.Array:
    """One coarse level: corr(53) ‖ rconv → decoder → (h,w,2)."""
    h, w, c = f1.shape
    k = 2 * md + 1
    inv_c = 1.0 / c
    f2p = jnp.pad(f2, ((md, md), (md, md), (0, 0)))
    # channel ch ↔ displacement (dy, dx) = (ch//k - md, ch%k - md), dy-major
    cv = jnp.stack(
        [
            jnp.sum(
                f1
                * jax.lax.slice(
                    f2p,
                    (ch // k, ch % k, 0),
                    (ch // k + h, ch % k + w, c),
                ),
                axis=-1,
            )
            * inv_c
            for ch in indices
        ],
        axis=-1,
    )
    r = _lrelu(_conv3x3(f1, wts["wr"], wts["br"]))
    x = jnp.concatenate([cv, r], axis=-1)
    x = _lrelu(_conv3x3(x, wts["w1"], wts["b1"]))
    x = _lrelu(_conv3x3(x, wts["w2"], wts["b2"]))
    x = _lrelu(_conv3x3(x, wts["w3"], wts["b3"]))
    x = _lrelu(_conv3x3(x, wts["w4"], wts["b4"]))
    x = _lrelu(_conv3x3(x, wts["w5"], wts["b5"]))
    x = _lrelu(_conv3x3(x, wts["w6"], wts["b6"]))
    return _conv3x3(x, wts["w7"], wts["b7"])


def _sample_math(f1s, f2s, levels, wout, bout, indices, md):
    """Full coarse head for ONE batch item (pure jnp — runs both as the
    XLA twin under vmap and as the Pallas kernel body)."""
    flows = [
        _level_flow(f1, f2, wts, indices, md)
        for f1, f2, wts in zip(f1s, f2s, levels)
    ]
    h, w, _ = flows[0].shape
    cat = jnp.concatenate(flows, axis=-1).reshape(h * w, 6)
    out = jnp.dot(cat, wout, preferred_element_type=jnp.float32) + bout
    return out.reshape(h, w, 2)


def _kernel(indices, md, *refs):
    f1s = [refs[2 * i][0] for i in range(3)]
    f2s = [refs[2 * i + 1][0] for i in range(3)]
    pos = 6
    levels = []
    for _ in range(3):
        levels.append(
            {k: refs[pos + j][:] for j, k in enumerate(_LEVEL_KEYS)}
        )
        pos += len(_LEVEL_KEYS)
    wout, bout, out_ref = refs[pos][:], refs[pos + 1][:], refs[pos + 2]
    out_ref[0] = _sample_math(f1s, f2s, levels, wout, bout, indices, md)


def coarse_head(
    f1_levels: Sequence[jax.Array],
    f2_levels: Sequence[jax.Array],
    params: Dict,
    groups: int = 5,
    indices: Sequence[int] = (),
    max_displacement: int = 4,
    impl: str = "pallas",
) -> jax.Array:
    """Fused EEMFlow coarse head.

    f1_levels/f2_levels: three pooled NHWC feature maps (same h,w; C =
    16/32/64).  params: the EEMFlow param tree (rconv_*/decoder_*/
    out_conv).  Returns the pre-upsample flow [B, h, w, 2], f32.
    """
    indices = tuple(int(i) for i in indices)
    f1_levels = [jnp.asarray(f, jnp.float32) for f in f1_levels]
    f2_levels = [jnp.asarray(f, jnp.float32) for f in f2_levels]
    levels, wout, bout = pack_coarse_head_weights(params, groups)
    B, h, w, _ = f1_levels[0].shape

    if impl == "xla":
        fn = jax.vmap(
            lambda a, b, c, d, e, f: _sample_math(
                (a, b, c), (d, e, f), levels, wout, bout, indices,
                max_displacement,
            )
        )
        return fn(*f1_levels, *f2_levels)

    args = []
    in_specs = []
    for f1, f2 in zip(f1_levels, f2_levels):
        for t in (f1, f2):
            args.append(t)
            in_specs.append(
                pl.BlockSpec(
                    (1,) + t.shape[1:],
                    functools.partial(lambda b, n: (b,) + (0,) * n,
                                      n=len(t.shape) - 1),
                    memory_space=pltpu.VMEM,
                )
            )
    for lvl in levels:
        for key in _LEVEL_KEYS:
            t = lvl[key]
            args.append(t)
            in_specs.append(
                pl.BlockSpec(
                    t.shape, lambda b: (0, 0), memory_space=pltpu.VMEM
                )
            )
    for t in (wout, bout):
        args.append(t)
        in_specs.append(
            pl.BlockSpec(t.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        )

    return pl.pallas_call(
        functools.partial(_kernel, indices, max_displacement),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, h, w, 2),
            lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, h, w, 2), jnp.float32),
        # CPU backend has no Mosaic path — interpret keeps the fast modes
        # functional (slow) there, so --fast CLIs work off-TPU
        interpret=jax.default_backend() == "cpu",
    )(*args)
