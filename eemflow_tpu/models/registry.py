"""Model registry — name → constructor, mirroring the reference CLI registry
(``train_EEMFlow_HREM.py:30-55``: eemflow, eraft, gma, gmflow, gmflownet,
flowformer, kpaflow, skflow, irrpwc, dceiflow, steflow, spikeflownet...).

Entries are filled in as families land; ``get_model`` raises with the list
of known names for anything not yet built.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(ctor):
        MODEL_REGISTRY[name] = ctor
        return ctor

    return deco


# reference CLI spellings (train_EEMFlow_HREM.py:30-55) → registry names
ALIASES = {
    "EEMFlow": "eemflow",
    "GMA": "gma",
    "spike_flownets": "spikeflownet",
}


def get_model(name: str, **kwargs):
    """Build a model by registry name (kwargs forwarded to the flax module)."""
    # populate lazily to avoid import cycles
    _populate()
    name = ALIASES.get(name, name)
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"Unknown model '{name}'. Available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name](**kwargs)


def _populate() -> None:
    if MODEL_REGISTRY:
        return
    from eemflow_tpu.models.eemflow import EEMFlow

    MODEL_REGISTRY["eemflow"] = EEMFlow
    try:
        from eemflow_tpu.models.eraft import ERAFT

        MODEL_REGISTRY["eraft"] = ERAFT
    except ImportError:
        pass
    try:
        from eemflow_tpu.models.eemflow_plus import EEMFlowPlus

        MODEL_REGISTRY["eemflow_plus"] = EEMFlowPlus
    except ImportError:
        pass
    try:
        from eemflow_tpu.models.gma import RAFTGMA

        MODEL_REGISTRY["gma"] = RAFTGMA
    except ImportError:
        pass
    try:
        from eemflow_tpu.models.unet import MIMOUNet, UNet, UNetL, UNetLittle
        from eemflow_tpu.models.unite import (
            DenoiseERAFT,
            MIMOUNetERAFT,
            UNetDenseCTX,
            UNetERAFT,
        )

        MODEL_REGISTRY["unet"] = UNet
        MODEL_REGISTRY["unet_l"] = UNetL
        MODEL_REGISTRY["unet_little"] = UNetLittle
        MODEL_REGISTRY["mimo_unet"] = MIMOUNet
        MODEL_REGISTRY["unite_unet_raft"] = UNetERAFT
        MODEL_REGISTRY["unite_densectx_raft"] = UNetDenseCTX
        MODEL_REGISTRY["unite_mimounet_raft"] = MIMOUNetERAFT
        MODEL_REGISTRY["unite_denoise_raft"] = DenoiseERAFT
    except ImportError:
        pass
    try:
        from eemflow_tpu.models.spike import SpikeFlowNetS, STEFlowNet

        MODEL_REGISTRY["spikeflownet"] = SpikeFlowNetS
        MODEL_REGISTRY["steflow"] = STEFlowNet
    except ImportError:
        pass
    try:
        from eemflow_tpu.models.irrpwc import PWCNet

        MODEL_REGISTRY["irrpwc"] = PWCNet
    except ImportError:
        pass
    try:
        from eemflow_tpu.models.gmflow import GMFlow

        MODEL_REGISTRY["gmflow"] = GMFlow
    except ImportError:
        pass
    try:
        from eemflow_tpu.models.skflow import SKFlow

        MODEL_REGISTRY["skflow"] = SKFlow
    except ImportError:
        pass
    try:
        from eemflow_tpu.models.kpaflow import KPAFlow

        MODEL_REGISTRY["kpaflow"] = KPAFlow
    except ImportError:
        pass
    try:
        from eemflow_tpu.models.dceiflow import DCEIFlow

        MODEL_REGISTRY["dceiflow"] = DCEIFlow
    except ImportError:
        pass
    try:
        from eemflow_tpu.models.raft import RAFT

        MODEL_REGISTRY["raft"] = RAFT
    except ImportError:
        pass
    try:
        from eemflow_tpu.models.gmflownet import GMFlowNetModel

        MODEL_REGISTRY["gmflownet"] = GMFlowNetModel
    except ImportError:
        pass
    try:
        from eemflow_tpu.models.flowformer import FlowFormer

        MODEL_REGISTRY["flowformer"] = FlowFormer
    except ImportError:
        pass
    try:
        from eemflow_tpu.models.event_transformer import EventTransformer
        from eemflow_tpu.models.gma_rnn import RAFTGMA_RNN

        MODEL_REGISTRY["event_transformer"] = EventTransformer
        MODEL_REGISTRY["gma_rnn"] = RAFTGMA_RNN
    except ImportError:
        pass
