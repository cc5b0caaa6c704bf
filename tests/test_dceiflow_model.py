"""DCEIFlow checkpoint parity: torch oracle (event+image fusion RAFT,
reference SDCEImodel/DCEIFlow.py) → converter → flax scan forward."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from eemflow_tpu.compat import torch_state_dict_to_flax
from eemflow_tpu.compat.torch_loader import eraft_alias
from eemflow_tpu.models.dceiflow import DCEIFlow

from torch_oracles import OracleDCEIFlow


@pytest.mark.zoo
def test_dceiflow_matches_torch_oracle():
    torch.manual_seed(0)
    iters = 3
    oracle = OracleDCEIFlow(event_bins=10, image_channels=3).eval()

    rng = np.random.default_rng(0)
    H, W = 64, 96
    ev = rng.random((1, 10, H, W)).astype(np.float32)
    img = (rng.random((1, 3, H, W)) * 255).astype(np.float32)

    with torch.no_grad():
        ref_list = oracle(torch.from_numpy(ev), torch.from_numpy(img), iters=iters)
    ref = np.stack([p.numpy() for p in ref_list])

    variables = torch_state_dict_to_flax(
        {k: v.numpy() for k, v in oracle.state_dict().items()},
        alias=eraft_alias,
    )
    model = DCEIFlow(n_first_channels=5, iters=iters)
    _, flows = model.apply(
        variables,
        jnp.asarray(ev.transpose(0, 2, 3, 1)),
        jnp.asarray(img.transpose(0, 2, 3, 1)),
    )
    got = np.asarray(flows).transpose(0, 1, 4, 2, 3)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-3)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
