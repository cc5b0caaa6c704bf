"""GMFlowNet checkpoint parity: torch oracle (MixAxialPOLA fnet + match
init + RAFT refinement, reference GMflownet/gmflownet_model.py) →
converter → flax forward must match, including the softCorrMap returned
for the coarse matching loss."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from eemflow_tpu.compat import torch_state_dict_to_flax
from eemflow_tpu.compat.torch_loader import gmflownet_alias
from eemflow_tpu.models.gmflownet import GMFlowNetModel

from torch_oracles import OracleGMFlowNet


@pytest.mark.zoo
def test_gmflownet_matches_torch_oracle():
    torch.manual_seed(0)
    iters = 3
    oracle = OracleGMFlowNet(cin=5, depth=6).eval()

    rng = np.random.default_rng(0)
    # 64x96 → 8x12 at 1/8: POLA window attention must zero-pad to 14x14,
    # exercising the reference's bias-valued padded-key semantics
    H, W = 64, 96
    ev1 = (rng.standard_normal((1, 5, H, W)) * 0.5).astype(np.float32)
    ev2 = (rng.standard_normal((1, 5, H, W)) * 0.5).astype(np.float32)

    with torch.no_grad():
        ref_list, ref_soft = oracle(
            torch.from_numpy(ev1), torch.from_numpy(ev2), iters=iters
        )
    ref = np.stack([p.numpy() for p in ref_list])

    variables = torch_state_dict_to_flax(
        {k: v.numpy() for k, v in oracle.state_dict().items()},
        alias=gmflownet_alias,
    )
    model = GMFlowNetModel(n_first_channels=5, iters=iters)
    j1 = jnp.asarray(ev1.transpose(0, 2, 3, 1))
    j2 = jnp.asarray(ev2.transpose(0, 2, 3, 1))

    # eval path: running-stats batch norm, flows only
    _, flows = model.apply(variables, j1, j2, train=False)
    got = np.asarray(flows).transpose(0, 1, 4, 2, 3)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-3)

    # train path returns (flows, softCorrMap) for the coarse matching loss;
    # softCorrMap only depends on the (norm-free) fnet, so it is comparable
    # against the eval-mode oracle
    (_, (_, soft)), _ = model.apply(
        variables, j1, j2, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(soft), ref_soft.numpy(), atol=5e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
