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


def create_save_path(save_dir: str, name: str, lr: float | None = None,
                     wdecay: float | None = None) -> str:
    sub = name if lr is None else f"{name}_lr{lr}_wd{wdecay}"
    path = os.path.join(save_dir, sub)
    os.makedirs(path, exist_ok=True)
    return path


def snapshot_config(cfg: Dict[str, Any], save_path: str) -> None:
    with open(os.path.join(save_path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
