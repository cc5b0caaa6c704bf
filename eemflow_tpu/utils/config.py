"""Config ingestion (reference JSON schema, ``config/a_meshflow.json``).

One typed accessor over the reference's JSON layout (SURVEY.md §2.9); the
run dir layout mirrors ``helper_functions.create_save_path`` + the config
snapshot dump (``train_EEMFlow_HREM.py:68-76``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict


def load_config(path: str, overrides: Dict[str, Any] | None = None) -> Dict[str, Any]:
    with open(path) as f:
        cfg = json.load(f)
    if overrides:
        for k, v in overrides.items():
            if v is None:
                continue
            # flat override of train.* keys, mirroring the reference's
            # argparse-over-config behavior (train_EEMFlow_HREM.py:57-61)
            if k in ("lr", "wdecay", "num_steps", "gamma", "clip", "epsilon"):
                cfg.setdefault("train", {})[k] = v
            else:
                cfg[k] = v
    return cfg


# flax Module dataclass machinery fields — never model hyperparameters
_FLAX_INTERNAL = ("name", "parent")


def model_kwargs_from_config(model_name: str, cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Collect the model hyperparameters a config carries.

    The reference stuffs model hyperparameters at the config's top level
    (e.g. ``config/kubric_gmflow.json``'s ``attn_splits_list`` /
    ``corr_radius_list`` / ``feature_channels``, consumed positionally in
    ``train_mvsec.py``'s per-model constructor calls).  Here the registry
    constructor's dataclass fields define the schema: any top-level config
    key naming a field of the model's flax Module is forwarded, JSON lists
    becoming tuples (flax fields must be hashable).  Keys already bound by
    a registry preset (``functools.partial``) are left to the preset — the
    registry name, not the config, defines the variant.
    """
    from eemflow_tpu.models.registry import ALIASES, MODEL_REGISTRY, _populate

    _populate()
    ctor = MODEL_REGISTRY[ALIASES.get(model_name, model_name)]
    cls = getattr(ctor, "func", ctor)
    fields = getattr(cls, "__dataclass_fields__", {})
    preset = getattr(ctor, "keywords", {})
    out: Dict[str, Any] = {}
    for k, v in cfg.items():
        if k in fields and k not in preset and k not in _FLAX_INTERNAL:
            out[k] = tuple(v) if isinstance(v, list) else v
    return out


def create_save_path(save_dir: str, name: str, lr: float | None = None,
                     wdecay: float | None = None) -> str:
    sub = name if lr is None else f"{name}_lr{lr}_wd{wdecay}"
    path = os.path.join(save_dir, sub)
    os.makedirs(path, exist_ok=True)
    return path


def snapshot_config(cfg: Dict[str, Any], save_path: str) -> None:
    with open(os.path.join(save_path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
