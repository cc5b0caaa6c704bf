"""RAFT-GMA parity: torch oracle → converter → flax scan-loop forward."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from eemflow_tpu.compat import torch_state_dict_to_flax
from eemflow_tpu.compat.torch_loader import eraft_alias
from eemflow_tpu.models.gma import RAFTGMA

from torch_oracles import OracleGMA


def test_gma_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = OracleGMA(n_first_channels=5).eval()

    rng = np.random.default_rng(0)
    H, W = 40, 56
    iters = 3
    ev1 = (rng.standard_normal((1, 5, H, W)) * 0.5).astype(np.float32)
    ev2 = (rng.standard_normal((1, 5, H, W)) * 0.5).astype(np.float32)

    with torch.no_grad():
        ref_list = oracle(torch.from_numpy(ev1), torch.from_numpy(ev2), iters=iters)
    ref = np.stack([p.numpy() for p in ref_list])

    variables = torch_state_dict_to_flax(
        {k: v.numpy() for k, v in oracle.state_dict().items()}, alias=eraft_alias
    )
    model = RAFTGMA(n_first_channels=5)
    _, flows = model.apply(
        variables,
        jnp.asarray(ev1.transpose(0, 2, 3, 1)),
        jnp.asarray(ev2.transpose(0, 2, 3, 1)),
        iters=iters,
    )
    got = np.asarray(flows).transpose(0, 1, 4, 2, 3)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-3)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
