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


@pytest.mark.smoke
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


def test_s2d_stem_exact_reparam():
    """The space-to-depth stem is an exact reparameterization: identical
    params → identical outputs (fp noise) with s2d on/off."""
    import jax
    import jax.numpy as jnp

    from eemflow_tpu.models.eemflow import EEMFlow

    rng = np.random.default_rng(9)
    x1 = jnp.asarray(rng.standard_normal((1, 64, 64, 5)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((1, 64, 64, 5)), jnp.float32)
    m_ref = EEMFlow(s2d_stem=False)
    m_s2d = EEMFlow(s2d_stem=True)
    v = m_ref.init(jax.random.PRNGKey(0), x1, x2)
    # identical param trees by construction (tested here)
    v2 = m_s2d.init(jax.random.PRNGKey(0), x1, x2)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    out_ref = np.asarray(m_ref.apply(v, x1, x2)[1][-1])
    out_s2d = np.asarray(m_s2d.apply(v, x1, x2)[1][-1])
    np.testing.assert_allclose(out_s2d, out_ref, atol=1e-4)


def test_restructure_modes_exact_reparam():
    """siamese_stack / stacked_coarse are exact graph restructures:
    identical params -> identical outputs (fp noise) vs the standard path,
    for both the grouped (groups=5) and ungrouped decoder variants."""
    import jax
    import jax.numpy as jnp

    from eemflow_tpu.models.eemflow import EEMFlow

    rng = np.random.default_rng(11)
    x1 = jnp.asarray(rng.standard_normal((2, 96, 128, 5)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((2, 96, 128, 5)), jnp.float32)
    for groups in (5, 1):
        m_ref = EEMFlow(groups=groups)
        v = m_ref.init(jax.random.PRNGKey(0), x1, x2)
        out_ref = np.asarray(m_ref.apply(v, x1, x2)[1][-1])
        for kw in (
            {"siamese_stack": True},
            {"stacked_coarse": True},
            {"siamese_stack": True, "stacked_coarse": True},
        ):
            m = EEMFlow(groups=groups, **kw)
            out = np.asarray(m.apply(v, x1, x2)[1][-1])
            np.testing.assert_allclose(out, out_ref, atol=1e-4, err_msg=str(kw))
