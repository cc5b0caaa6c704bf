"""GMFlow checkpoint parity: torch oracle (random init, reference
architecture/state_dict layout) → converter → flax forward must match.

Covers both shipped regimes: 1-scale global matching (kubric_gmflow.json
schema) and 2-scale trident + local matching + local propagation
(reference gmflow.py:120-168 refinement path).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from eemflow_tpu.compat import torch_state_dict_to_flax
from eemflow_tpu.compat.torch_loader import gmflow_alias
from eemflow_tpu.models.gmflow import GMFlow

from torch_oracles import OracleGMFlow


def _run_parity(num_scales, attn_splits, corr_radius, prop_radius,
                upsample_factor, train, atol=5e-3):
    torch.manual_seed(0)
    oracle = OracleGMFlow(
        cin=5, num_scales=num_scales, feature_channels=128,
        upsample_factor=upsample_factor, num_layers=6, ffn_exp=1,
        attn_splits_list=attn_splits, corr_radius_list=corr_radius,
        prop_radius_list=prop_radius,
    )
    oracle.train(train)

    rng = np.random.default_rng(0)
    H, W = 64, 96  # multiples of 32: padding is identity
    ev1 = (rng.standard_normal((1, 5, H, W)) * 0.5).astype(np.float32)
    ev2 = (rng.standard_normal((1, 5, H, W)) * 0.5).astype(np.float32)

    with torch.no_grad():
        ref_list = oracle(torch.from_numpy(ev1), torch.from_numpy(ev2))
    ref = np.stack([p.numpy() for p in ref_list])

    variables = torch_state_dict_to_flax(
        {k: v.numpy() for k, v in oracle.state_dict().items()},
        alias=gmflow_alias,
    )
    model = GMFlow(
        n_first_channels=5, num_scales=num_scales, feature_channels=128,
        upsample_factor=upsample_factor, num_transformer_layers=6,
        ffn_dim_expansion=1, attn_splits_list=attn_splits,
        corr_radius_list=corr_radius, prop_radius_list=prop_radius,
    )
    _, flows = model.apply(
        variables,
        jnp.asarray(ev1.transpose(0, 2, 3, 1)),
        jnp.asarray(ev2.transpose(0, 2, 3, 1)),
        train=train,
    )
    got = np.stack([np.asarray(f).transpose(0, 3, 1, 2) for f in flows])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=atol)


@pytest.mark.zoo
def test_gmflow_global_matches_torch_oracle():
    _run_parity(1, (2,), (-1,), (-1,), 8, train=False)


@pytest.mark.zoo
def test_gmflow_two_scale_local_matches_torch_oracle():
    """Exercises trident conv, flow_warp refinement, local matching and
    local-window propagation (reference gmflow.py:120-168).  Random-init
    global matching yields ~±60 px flows scaled ×8 through two refinement
    scales, so fp accumulation needs a slightly looser absolute tolerance
    (measured max dev 0.017 px at 0.5% of pixels — ~3e-4 relative)."""
    _run_parity(2, (2, 2), (-1, 4), (-1, 1), 4, train=True, atol=5e-2)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
