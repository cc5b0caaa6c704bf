"""PyTorch checkpoint → flax params converter.

Loads the reference's released ``.pth.tar`` checkpoints
(``{'epoch', 'state_dict'}``, reference ``train_EEMFlow_HREM.py:127-130``),
strips the ``DataParallel`` ``module.`` prefix
(reference ``test_EEMFlow_HREM.py:63-66``) and rewrites keys/layouts:

  * conv weight  [O, I/g, kh, kw] → kernel [kh, kw, I/g, O]
  * linear weight [O, I]          → kernel [I, O]
  * conv-transpose weight [I, O, kh, kw] → kernel [kh, kw, I, O] (kept in a
    torch-compatible layout by our ``Deconv``; listed per-model)
  * norm weight/bias → scale/bias; BatchNorm running stats → batch_stats

Model-specific torch-attribute → flax-module path aliases are passed in by
each model's ``TORCH_ALIASES`` table.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Tuple

import numpy as np


def strip_module_prefix(state_dict: Dict[str, "np.ndarray"]) -> Dict[str, "np.ndarray"]:
    out = {}
    for k, v in state_dict.items():
        out[k[len("module.") :] if k.startswith("module.") else k] = v
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth(.tar) file to a flat {key: np.ndarray} dict (CPU)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt
    if isinstance(ckpt, dict):
        # reference wraps under 'state_dict' (train_EEMFlow_HREM.py:128);
        # upstream E-RAFT releases wrap under 'model'
        for wrapper in ("state_dict", "model"):
            inner = ckpt.get(wrapper)
            if isinstance(inner, dict):
                sd = inner
                break
    sd = strip_module_prefix(sd)
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v) for k, v in sd.items()}


def _set_path(tree: dict, path: Tuple[str, ...], leaf_name: str, value) -> None:
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


def torch_state_dict_to_flax(
    state_dict: Dict[str, np.ndarray],
    alias: Optional[Callable[[str], Optional[Tuple[str, ...]]]] = None,
    transposed_conv_paths: Iterable[str] = (),
    batchnorm_paths: Iterable[str] = (),
) -> Dict[str, dict]:
    """Convert a flat torch state_dict to flax variables.

    Returns {'params': ..., 'batch_stats': ...} (batch_stats only if any).

    alias: maps a torch module path (dot-joined, without the trailing
    parameter name) to a flax path tuple; returning None uses the torch path
    split on dots.  transposed_conv_paths / batchnorm_paths identify modules
    needing special layout handling.
    """
    params: dict = {}
    batch_stats: dict = {}
    tconv = set(transposed_conv_paths)
    bnorm = set(batchnorm_paths)

    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        if key.endswith("relative_position_index"):
            # deterministic index buffer (GMFlowNet POLA attention,
            # reference swin_transformer.py:684) — recomputed, not a param
            continue
        if "." in key:
            mod_path, leaf = key.rsplit(".", 1)
        else:  # root-level parameter (e.g. KPAFlow's frozen 'zero' buffer)
            mod_path, leaf = "", key
        if mod_path == "":
            path = ()
        else:
            path = alias(mod_path) if alias is not None else None
            if path is None:
                path = tuple(mod_path.split("."))

        v = np.asarray(val)
        is_bn = mod_path in bnorm
        if leaf == "weight":
            if is_bn:
                _set_path(params, path, "scale", v)
            elif v.ndim == 4:
                if mod_path in tconv:
                    # torch convtranspose [I, O, kh, kw] → [kh, kw, I, O]
                    _set_path(params, path, "kernel", v.transpose(2, 3, 0, 1))
                else:
                    _set_path(params, path, "kernel", v.transpose(2, 3, 1, 0))
            elif v.ndim == 2:
                _set_path(params, path, "kernel", v.T)
            else:
                _set_path(params, path, "scale", v)
        elif leaf == "bias":
            _set_path(params, path, "bias", v)
        elif leaf == "running_mean":
            _set_path(batch_stats, path, "mean", v)
        elif leaf == "running_var":
            _set_path(batch_stats, path, "var", v)
        else:
            _set_path(params, path, leaf, v)

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def eemflow_alias(mod_path: str) -> Optional[Tuple[str, ...]]:
    """EEMFlow torch attribute paths → flax module paths.

    The shared conv pyramid lives under the 'pyramid' submodule in our
    model; everything else maps 1:1."""
    parts = tuple(mod_path.split("."))
    if parts[0].startswith("pconv"):
        return ("pyramid",) + parts
    return parts


def eraft_alias(mod_path: str) -> Tuple[str, ...]:
    """E-RAFT torch attribute paths → flax module paths.

    layerX.N → layerX_N; downsample Sequential [conv, norm3] →
    downsample_0 / norm3 (the reference registers norm3 both standalone and
    inside the Sequential — both spellings map to the same flax path);
    mask.N → mask_N."""
    parts = mod_path.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        nxt = parts[i + 1] if i + 1 < len(parts) else None
        if p.startswith("layer") and nxt is not None and nxt.isdigit():
            out.append(f"{p}_{nxt}")
            i += 2
        elif p == "downsample" and nxt == "0":
            out.append("downsample_0")
            i += 2
        elif p == "downsample" and nxt == "1":
            out.append("norm3")
            i += 2
        elif p == "mask" and nxt is not None and nxt.isdigit():
            out.append(f"mask_{nxt}")
            i += 2
        else:
            out.append(p)
            i += 1
    return tuple(out)


def digit_merge_alias(mod_path: str) -> Tuple[str, ...]:
    """Generic alias: merge every ``name.N`` (ModuleList / Sequential index)
    into ``name_N`` — the flax naming convention used throughout the zoo.
    E.g. ``transformer.layers.0.mlp.0`` → ``transformer/layers_0/mlp_0``."""
    parts = mod_path.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        nxt = parts[i + 1] if i + 1 < len(parts) else None
        if nxt is not None and nxt.isdigit():
            out.append(f"{p}_{nxt}")
            i += 2
        else:
            out.append(p)
            i += 1
    return tuple(out)


# GMFlow's torch module tree (backbone.layerX.N, transformer.layers.N,
# mlp.N, upsampler.N, feature_flow_attn.*) is exactly the digit-merge shape
# (reference model/GMflow/gmflow.py:13-44, transformer.py, backbone.py).
gmflow_alias = digit_merge_alias


def flownet1s_alias(mod_path: str) -> Tuple[str, ...]:
    """FlowNet1S family (reference model/IRRPWC/flownet1s*.py): strip the
    leading-underscore attribute convention; decoder-arm modules
    (_deconvN / _predict_flowN / _upsample_flowX_to_Y and their _occ
    twins) nest under flow_decoder / occ_decoder; encoder convs fold the
    Sequential '0' into the name (convN_0); _flownets → flownets."""
    parts = [p.lstrip("_") for p in mod_path.split(".")]
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        nxt = parts[i + 1] if i + 1 < len(parts) else None
        if p.startswith("conv") and nxt == "0":
            # the stem convs live at the flax top level in BOTH layouts
            # (plain flownet1s nests them inside _flownets, the irr
            # variants keep them outside — flax unifies at the top)
            if p in ("conv1", "conv2", "conv3") and out and out[-1] == "flownets":
                out.pop()
            out.append(f"{p}_0")
            i += 2
        elif p.startswith("deconv_occ"):
            out.append("occ_decoder")
            out.append(p)
            i += 1
        elif p.startswith("deconv"):
            n = p[len("deconv"):]
            out.append("flow_decoder")
            out.append(f"deconv_flow{n}")
            i += 1
        elif p.startswith("predict_occ") or p.startswith("upsample_occ"):
            out.append("occ_decoder")
            out.append(p)
            i += 1
        elif p.startswith("predict_flow") or p.startswith("upsample_flow"):
            out.append("flow_decoder")
            out.append(p)
            i += 1
        else:
            out.append(p)
            i += 1
    return tuple(out)


def flownet1s_tconv_paths(occ: bool) -> Tuple[str, ...]:
    """Torch ConvTranspose module paths in a FlowNet1S checkpoint."""
    paths = []
    for tag, on in (("", True), ("_occ", occ)):
        if not on:
            continue
        paths += [f"_flownets._deconv{tag}{n}.0" for n in (5, 4, 3, 2)]
        paths += [
            f"_flownets._upsample_{'flow' if not tag else 'occ'}{n}_to_{n - 1}"
            for n in (6, 5, 4, 3)
        ]
    return tuple(paths)


def ste_alias(mod_path: str) -> Tuple[str, ...]:
    """STE-FlowNet: drop the 'gru' level inside gru_updateN (the
    SmallUpdateBlock wrapper, reference STEmodel/STEFlow.py:43-56, is a
    bare ConvGRU in flax); everything else splits directly."""
    parts = mod_path.split(".")
    out = []
    for i, p in enumerate(parts):
        if p == "gru" and i > 0 and parts[i - 1].startswith("gru_update"):
            continue
        out.append(p)
    return tuple(out)


# ConvTranspose module paths shared by the spike/STE FlowNetS decoders
SPIKE_TCONV_PATHS = (
    "deconv3.0", "deconv2.0", "deconv1.0",
    "upsampled_flow4_to_3", "upsampled_flow3_to_2",
    "upsampled_flow2_to_1", "upsampled_flow1_to_0",
)
# STE additionally registers unused flow_deconvN heads (STEFlow.py:110-119)
STE_DROP = ("flow_deconv",)


def irrpwc_alias(mod_path: str) -> Tuple[str, ...]:
    """IRR-PWC family torch paths → flax paths (reference
    model/IRRPWC/pwc_modules.py module layout):

      * ``feature_pyramid_extractor.convs.L.S.0`` → ``convs_L_S / 0``
        (ModuleList → Sequential(conv, conv) → inner Conv2d),
      * dense-estimator ``convN.0`` stays ``convN / 0`` (ConvRelu inner),
        ``conv_last.0`` folds to ``conv_last_0``,
      * context-network ``convs.i(.0)`` → ``convs_i / 0`` with the final
        ``convs.6.0`` folded to ``convs_6_0``,
      * ``conv_1x1.L.0`` / ``flow_estimators.L`` / ``occ_estimators.L``
        ModuleList indices merge into the name."""
    parts = mod_path.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        nxt = parts[i + 1] if i + 1 < len(parts) else None
        nxt2 = parts[i + 2] if i + 2 < len(parts) else None
        if p == "feature_pyramid_extractor" and nxt == "convs":
            out.append(p)
            out.append(f"convs_{parts[i + 2]}_{parts[i + 3]}")
            i += 4
        elif p == "conv_last" and nxt == "0":
            out.append("conv_last_0")
            i += 2
        elif p == "convs" and nxt is not None and nxt.isdigit():
            if nxt == "6" and nxt2 == "0":
                out.append("convs_6_0")
                i += 3
            else:
                out.append(f"convs_{nxt}")
                i += 2
        elif (
            p in ("conv_1x1", "flow_estimators", "occ_estimators")
            and nxt is not None
            and nxt.isdigit()
        ):
            out.append(f"{p}_{nxt}")
            i += 2
        else:
            out.append(p)
            i += 1
    return tuple(out)


def gmflownet_alias(mod_path: str) -> Tuple[str, ...]:
    """GMFlowNet torch paths → flax paths: the fnet Sequential's two stages
    flatten to fnet_0 / fnet_1_blocks_{i} / fnet_1_norm (reference
    gmflownet_model.py:50-58), timm Mlp params to mlp_fc1/fc2, the rest is
    digit-merge."""
    p = mod_path
    if p.startswith("fnet.0."):
        p = "fnet_0." + p[len("fnet.0."):]
    elif p.startswith("fnet.1.blocks."):
        rest = p[len("fnet.1.blocks."):]
        n, _, tail = rest.partition(".")
        p = f"fnet_1_blocks_{n}" + ("." + tail if tail else "")
    elif p == "fnet.1.norm":
        p = "fnet_1_norm"
    p = p.replace("mlp.fc", "mlp_fc")
    return digit_merge_alias(p)


def flowformer_alias(mod_path: str) -> Tuple[str, ...]:
    """FlowFormer torch paths → flax paths: the decoder cross-attend's k/v
    are standalone Dense modules (projected from memory once per forward,
    reference decoder.py:64-66), timm Mlp params flatten to mlp_fc1/fc2,
    everything else is digit-merge."""
    p = mod_path
    if p.endswith("decoder_layer.cross_attend.k"):
        p = p.replace("decoder_layer.cross_attend.k", "decoder_layer_cross_attend_k")
    elif p.endswith("decoder_layer.cross_attend.v"):
        p = p.replace("decoder_layer.cross_attend.v", "decoder_layer_cross_attend_v")
    else:
        p = p.replace("decoder_layer.cross_attend", "decoder_layer_cross_attend")
    p = p.replace("mlp.fc", "mlp_fc")
    return digit_merge_alias(p)


def eemflow_plus_alias(mod_path: str) -> Optional[Tuple[str, ...]]:
    """EEMFlow+ torch attribute paths → flax module paths.

    pconv* live under 'pyramid'; ``conv_1x1`` ModuleList entries become
    ``conv_1x1_{i}`` (dropping the inner Sequential '0'); the SGU's
    ``conv_last.0`` becomes ``conv_last_0``."""
    parts = mod_path.split(".")
    if parts[0].startswith("pconv"):
        return ("pyramid",) + tuple(parts)
    if parts[0] == "conv_1x1":
        # Sequential(conv, LeakyReLU) → ConvRelu with inner '0'
        return (f"conv_1x1_{parts[1]}",) + tuple(parts[2:])
    out = []
    i = 0
    while i < len(parts):
        if parts[i] == "conv_last" and i + 1 < len(parts) and parts[i + 1] == "0":
            out.append("conv_last_0")
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return tuple(out)


def filter_state_dict(
    state_dict: Dict[str, np.ndarray], drop_prefixes: Iterable[str]
) -> Dict[str, np.ndarray]:
    """Drop checkpoint entries with no live forward path (e.g. EEMFlow+'s
    unused deconvs, see models.eemflow_plus.EEMFLOW_PLUS_DROP)."""
    drop = tuple(drop_prefixes)
    return {k: v for k, v in state_dict.items() if not k.startswith(drop)}


# -------------------------------------------------------------------------
# Per-model converter registry: registry name → (alias, drop_prefixes,
# transposed_conv_paths).  ``convert_for_model`` is the one-call surface
# the CLIs use to ingest a reference .pth.tar for any zoo family.
# -------------------------------------------------------------------------

# the GMA-style attention registers relative-position tables that the
# shipped content-only forward never reads (GMA/gma.py:52, SKflow/gma.py:52,
# flowformer LatentCostFormer/gma.py:54)
_POS_EMB_DROP = ("att.pos_emb.",)


def event_transformer_alias(mod_path: str) -> Optional[Tuple[str, ...]]:
    """EventTransformer torch paths → flax paths: the score/output
    projections live inside the shared ``attn`` submodule
    (models/event_transformer.py _VectorAttention)."""
    parts = mod_path.split(".")
    if (len(parts) == 2 and parts[0] in ("lx_former", "gx_former")
            and parts[1] in ("w_sa1", "w_sa2")):
        return (parts[0], "attn", parts[1])
    return None


# dead modules in the reference transformer (constructed, never called in
# forward — ev_transformer_batch.py:88,144)
EVENT_TRANSFORMER_DROP = ("lx_former.layer_norm", "gx_former.layer_norm")


def gma_rnn_alias(mod_path: str) -> Tuple[str, ...]:
    """RAFTGMA_rnn = GMA modules + an ev_transformer submodule."""
    if mod_path.startswith("ev_transformer."):
        sub = mod_path[len("ev_transformer."):]
        p = event_transformer_alias(sub)
        return ("ev_transformer",) + (p if p else tuple(sub.split(".")))
    return eraft_alias(mod_path)


GMA_RNN_DROP = tuple(
    "ev_transformer." + d for d in EVENT_TRANSFORMER_DROP
) + ("att.pos_emb.",)


def _model_converters():
    from eemflow_tpu.models.eemflow_plus import EEMFLOW_PLUS_DROP
    from eemflow_tpu.models.flowformer import FLOWFORMER_DROP

    table = {
        "eemflow": (eemflow_alias, (), ()),
        "eemflow_plus": (eemflow_plus_alias, EEMFLOW_PLUS_DROP, ()),
        "eraft": (eraft_alias, (), ()),
        "gma": (eraft_alias, _POS_EMB_DROP, ()),
        "gma_rnn": (gma_rnn_alias, GMA_RNN_DROP, ()),
        "gmflow": (gmflow_alias, (), ()),
        "gmflownet": (gmflownet_alias, (), ()),
        "flowformer": (flowformer_alias, FLOWFORMER_DROP, ()),
        "kpaflow": (digit_merge_alias, ("zero",), ()),
        "skflow": (digit_merge_alias, _POS_EMB_DROP, ()),
        "dceiflow": (eraft_alias, (), ()),
        "event_transformer": (event_transformer_alias,
                              EVENT_TRANSFORMER_DROP, ()),
        "steflow": (ste_alias, STE_DROP, SPIKE_TCONV_PATHS),
        "spikeflownet": (None, (), SPIKE_TCONV_PATHS),
        "spike_flownets": (None, (), SPIKE_TCONV_PATHS),
    }
    for name in ("irrpwc", "irrpwc_occ", "pwcnet", "pwcnet_bi", "pwcnet_occ",
                 "pwcnet_occ_bi", "pwcnet_irr_bi", "pwcnet_irr_occ",
                 "pwcnet_irr_occ_bi"):
        table[name] = (irrpwc_alias, (), ())
    for name in ("flownet1s", "flownet1s_irr", "flownet1s_irr_bi"):
        table[name] = (flownet1s_alias, (), flownet1s_tconv_paths(occ=False))
    for name in ("flownet1s_irr_occ", "flownet1s_irr_occ_bi", "irr_flownet"):
        table[name] = (flownet1s_alias, (), flownet1s_tconv_paths(occ=True))
    return table


def convert_for_model(model_name: str, state_dict: Dict[str, np.ndarray]):
    """Convert a reference torch state_dict (already ``module.``-stripped)
    to flax variables using the model family's alias / drop / transposed
    -conv configuration.  Unknown names fall back to the RAFT-lineage
    ``eraft_alias`` (the reference's dominant module layout)."""
    alias, drop, tconv = _model_converters().get(
        model_name, (eraft_alias, (), ())
    )
    if drop:
        state_dict = filter_state_dict(state_dict, drop)
    return torch_state_dict_to_flax(
        state_dict, alias=alias, transposed_conv_paths=tconv
    )
