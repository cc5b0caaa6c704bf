"""IRR-PWC family checkpoint parity: torch oracles (reference
model/IRRPWC/pwcnet_irr.py — the live 'irrpwc' registry path — plus the
pwcnet variant family) → converter → flax forward must match.

The non-irr cases also pin the replacement-vs-residual semantics
(pwcnet.py:78-82: non-irr REPLACES the field with the estimator output)
and the occ_bi backward-arm x1 quirk (pwcnet_occ_bi.py:103)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from eemflow_tpu.compat import torch_state_dict_to_flax
from eemflow_tpu.compat.torch_loader import irrpwc_alias
from eemflow_tpu.models.irrpwc import PWCFamilyNet, PWCNet

from torch_oracles import OracleIRRPWC, OraclePWCFamily


def _inputs():
    rng = np.random.default_rng(0)
    H, W = 64, 96
    ev1 = (rng.standard_normal((1, 5, H, W)) * 0.5).astype(np.float32)
    ev2 = (rng.standard_normal((1, 5, H, W)) * 0.5).astype(np.float32)
    return ev1, ev2


@pytest.mark.zoo
def test_irrpwc_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = OracleIRRPWC(cin=5).eval()
    ev1, ev2 = _inputs()
    with torch.no_grad():
        ref_list = oracle(torch.from_numpy(ev1), torch.from_numpy(ev2))
    ref = np.stack([p.numpy() for p in ref_list])

    variables = torch_state_dict_to_flax(
        {k: v.numpy() for k, v in oracle.state_dict().items()},
        alias=irrpwc_alias,
    )
    model = PWCNet(n_first_channels=5)
    _, flows = model.apply(
        variables,
        jnp.asarray(ev1.transpose(0, 2, 3, 1)),
        jnp.asarray(ev2.transpose(0, 2, 3, 1)),
    )
    got = np.stack([np.asarray(f).transpose(0, 3, 1, 2) for f in flows])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-3)


@pytest.mark.zoo
@pytest.mark.parametrize(
    "irr,bi,occ",
    [(False, False, False), (False, True, True), (True, True, True)],
    ids=["pwcnet", "pwcnet_occ_bi", "pwcnet_irr_occ_bi"],
)
def test_pwc_family_matches_torch_oracle(irr, bi, occ):
    torch.manual_seed(0)
    oracle = OraclePWCFamily(cin=5, irr=irr, bi=bi, occ=occ).eval()
    ev1, ev2 = _inputs()
    with torch.no_grad():
        ref_maps, ref_list = oracle(torch.from_numpy(ev1), torch.from_numpy(ev2))
    ref = np.stack([p.numpy() for p in ref_list])

    variables = torch_state_dict_to_flax(
        {k: v.numpy() for k, v in oracle.state_dict().items()},
        alias=irrpwc_alias,
    )
    model = PWCFamilyNet(n_first_channels=5, irr=irr, bi=bi, occ=occ)
    maps, flows = model.apply(
        variables,
        jnp.asarray(ev1.transpose(0, 2, 3, 1)),
        jnp.asarray(ev2.transpose(0, 2, 3, 1)),
    )
    got = np.stack([np.asarray(f).transpose(0, 3, 1, 2) for f in flows])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-3)
    if occ:
        np.testing.assert_allclose(
            np.asarray(maps[0]).transpose(0, 3, 1, 2), ref_maps[0].numpy(),
            atol=5e-3,
        )
        if bi:
            np.testing.assert_allclose(
                np.asarray(maps[1]).transpose(0, 3, 1, 2), ref_maps[1].numpy(),
                atol=5e-3,
            )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
