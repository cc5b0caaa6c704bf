"""FlowNet1S family checkpoint parity: torch oracles (reference
model/IRRPWC/flownet1s.py and flownet1s_irr_occ_bi.py, including the
ConvTranspose decoder layouts and the adaptive-avg-pool concatenate_as
path at non-power-of-two shapes) → converter → flax forward."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from eemflow_tpu.compat import torch_state_dict_to_flax
from eemflow_tpu.compat.torch_loader import flownet1s_alias, flownet1s_tconv_paths
from eemflow_tpu.models.flownet1s import FlowNet1S

from torch_oracles import OracleFlowNet1SIrrOccBi, OracleFlowNet1SPlain


def _inputs():
    rng = np.random.default_rng(0)
    # 64x96: conv6 level is 1x2 while conv5_1 is 2x3, so the decoder's
    # deconv5 output (2x4) exercises the adaptive-avg-pool resize branch
    H, W = 64, 96
    ev1 = (rng.standard_normal((1, 5, H, W)) * 0.5).astype(np.float32)
    ev2 = (rng.standard_normal((1, 5, H, W)) * 0.5).astype(np.float32)
    return ev1, ev2


@pytest.mark.zoo
def test_flownet1s_plain_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = OracleFlowNet1SPlain(cin=5).eval()
    ev1, ev2 = _inputs()
    with torch.no_grad():
        ref_list = oracle(torch.from_numpy(ev1), torch.from_numpy(ev2))
    ref = np.stack([p.numpy() for p in ref_list])

    variables = torch_state_dict_to_flax(
        {k: v.numpy() for k, v in oracle.state_dict().items()},
        alias=flownet1s_alias,
        transposed_conv_paths=flownet1s_tconv_paths(occ=False),
    )
    model = FlowNet1S(n_first_channels=5)
    _, flows = model.apply(
        variables,
        jnp.asarray(ev1.transpose(0, 2, 3, 1)),
        jnp.asarray(ev2.transpose(0, 2, 3, 1)),
    )
    got = np.stack([np.asarray(f).transpose(0, 3, 1, 2) for f in flows])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-3)


@pytest.mark.zoo
def test_flownet1s_irr_occ_bi_matches_torch_oracle():
    torch.manual_seed(0)
    iters = 2
    oracle = OracleFlowNet1SIrrOccBi(cin=5, num_iters=iters).eval()
    ev1, ev2 = _inputs()
    with torch.no_grad():
        (ref_of, ref_ob), ref_list = oracle(
            torch.from_numpy(ev1), torch.from_numpy(ev2)
        )
    ref = np.stack([p.numpy() for p in ref_list])

    variables = torch_state_dict_to_flax(
        {k: v.numpy() for k, v in oracle.state_dict().items()},
        alias=flownet1s_alias,
        transposed_conv_paths=flownet1s_tconv_paths(occ=True),
    )
    model = FlowNet1S(n_first_channels=5, irr=True, bi=True, occ=True,
                      num_iters=iters)
    maps, flows = model.apply(
        variables,
        jnp.asarray(ev1.transpose(0, 2, 3, 1)),
        jnp.asarray(ev2.transpose(0, 2, 3, 1)),
    )
    got = np.stack([np.asarray(f).transpose(0, 3, 1, 2) for f in flows])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(maps[0]).transpose(0, 3, 1, 2), ref_of.numpy(), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(maps[1]).transpose(0, 3, 1, 2), ref_ob.numpy(), atol=5e-3
    )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
