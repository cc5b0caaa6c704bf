"""Test config: force JAX onto CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (the TPU-world fake backend the reference never
had — SURVEY.md §4).  Must run before any jax import."""

import os

# Force (not setdefault): the environment presets JAX_PLATFORMS=axon (the
# tunneled TPU) and tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (env must be set first)

# The axon TPU plugin ignores the JAX_PLATFORMS env var in this image — the
# config API is honored, so force the CPU backend here as well.
jax.config.update("jax_platforms", "cpu")

# Parity mode: JAX's default matmul precision downcasts fp32 (~1e-2 error);
# golden tests compare against full-fp32 torch.  (The JAX_* env var spelling
# is not honored for this option — set the config directly.)
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    # tiers: default (fast ops/golden/data, <5 min) vs the multi-minute model
    # -zoo compile/parity tier.  Run fast only: `pytest -m "not zoo"`.
    config.addinivalue_line(
        "markers", "zoo: slow model-zoo compile / checkpoint-parity tests"
    )
    # pre-commit gate on this 1-core VM: `pytest -m smoke` (<2 min) —
    # registry exact-set, adapters family map, config surface, one jitted
    # EEMFlow forward.  The "fast" lane (-m "not zoo") has grown to ~18 min
    # here; run it (or the full suite) before milestones, smoke before
    # every commit.
    config.addinivalue_line(
        "markers", "smoke: <2-min pre-commit tier (registry/adapters/configs/one fwd)"
    )
