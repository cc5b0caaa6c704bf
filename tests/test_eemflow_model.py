"""End-to-end EEMFlow parity: torch oracle (random weights) → converter →
flax model forward must match.  This exercises the same path a released
reference checkpoint takes through ``compat.torch_loader``."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from eemflow_tpu.compat import torch_state_dict_to_flax
from eemflow_tpu.compat.torch_loader import eemflow_alias, strip_module_prefix
from eemflow_tpu.models.eemflow import EEMFlow

from torch_oracles import OracleEEMFlow


def test_eemflow_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = OracleEEMFlow(groups=5, n_first_channels=5).eval()

    rng = np.random.default_rng(0)
    H, W = 96, 128  # multiple-of-64 + non-multiple exercise padding below
    ev1 = rng.standard_normal((1, 5, H, W)).astype(np.float32)
    ev2 = rng.standard_normal((1, 5, H, W)).astype(np.float32)

    with torch.no_grad():
        ref = oracle(torch.from_numpy(ev1), torch.from_numpy(ev2)).numpy()

    variables = torch_state_dict_to_flax(
        {k: v.numpy() for k, v in oracle.state_dict().items() if k != "index"},
        alias=eemflow_alias,
    )
    model = EEMFlow()
    _, flows = model.apply(
        variables,
        jnp.asarray(ev1.transpose(0, 2, 3, 1)),
        jnp.asarray(ev2.transpose(0, 2, 3, 1)),
    )
    got = np.asarray(flows[-1]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_eemflow_nonmultiple_size_padding():
    """720p-like: H=72, W=100 → padded to 128×128 inside, output back at 72×100."""
    torch.manual_seed(1)
    oracle = OracleEEMFlow(groups=5, n_first_channels=5).eval()
    rng = np.random.default_rng(1)
    ev1 = rng.standard_normal((2, 5, 72, 100)).astype(np.float32)
    ev2 = rng.standard_normal((2, 5, 72, 100)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(ev1), torch.from_numpy(ev2)).numpy()
    variables = torch_state_dict_to_flax(
        {k: v.numpy() for k, v in oracle.state_dict().items() if k != "index"},
        alias=eemflow_alias,
    )
    _, flows = EEMFlow().apply(
        variables,
        jnp.asarray(ev1.transpose(0, 2, 3, 1)),
        jnp.asarray(ev2.transpose(0, 2, 3, 1)),
    )
    got = np.asarray(flows[-1]).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_eemflow_init_and_jit():
    """Model initializes from scratch and jits."""
    model = EEMFlow()
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 5))
    variables = model.init(rng, x, x)
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b)[1][-1])
    out = fwd(variables, x, x)
    assert out.shape == (1, 64, 64, 2)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
