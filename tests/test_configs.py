"""Config surface (SURVEY §2.9, reference ``config/`` — 30 files): every
shipped config must name a registry model and build it through the CLI
path (``utils.config.model_kwargs_from_config`` → ``get_model``), and
every train-adapter family must be driveable from at least one config."""

import glob
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*.json")))

# no compiles anywhere in this module — part of the <2-min smoke gate
pytestmark = pytest.mark.smoke


def _load(path):
    with open(path) as f:
        return json.load(f)


def test_configs_exist():
    assert len(CONFIGS) >= 16


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds_model_via_cli_path(path):
    from eemflow_tpu.models import get_model
    from eemflow_tpu.utils.config import model_kwargs_from_config

    cfg = _load(path)
    assert "model" in cfg, f"{path} names no registry model"
    kwargs = model_kwargs_from_config(cfg["model"], cfg)
    model = get_model(cfg["model"], **kwargs)
    assert model is not None
    # the forwarded hyperparameters actually landed on the module
    for k, v in kwargs.items():
        assert getattr(model, k) == v


def test_every_family_has_a_config():
    from eemflow_tpu.train.adapters import FAMILIES, MODEL_FAMILY

    covered = set()
    for path in CONFIGS:
        cfg = _load(path)
        m = cfg.get("model")
        if m in MODEL_FAMILY:
            covered.add(MODEL_FAMILY[m])
    missing = set(FAMILIES) - covered
    assert not missing, f"no config drives families: {sorted(missing)}"


def test_model_kwargs_respects_registry_presets():
    """A config key matching a preset-bound field must not override the
    registry variant (the name defines the variant, not the config)."""
    from eemflow_tpu.utils.config import model_kwargs_from_config

    kw = model_kwargs_from_config(
        "pwcnet_occ_bi", {"bi": False, "occ": False, "iters": 3}
    )
    assert "bi" not in kw and "occ" not in kw


def test_model_kwargs_tuples_lists():
    from eemflow_tpu.utils.config import model_kwargs_from_config

    kw = model_kwargs_from_config("gmflow", {"attn_splits_list": [2, 8]})
    assert kw["attn_splits_list"] == (2, 8)
