"""EEMFlow+ parity: torch oracle → converter (with dead-param drop) →
flax coarse-to-fine forward with SGU must match across all 5 predictions."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from eemflow_tpu.compat import torch_state_dict_to_flax
from eemflow_tpu.compat.torch_loader import eemflow_plus_alias, filter_state_dict
from eemflow_tpu.models.eemflow_plus import EEMFLOW_PLUS_DROP, EEMFlowPlus

from torch_oracles import OracleEEMFlowPlus


def test_eemflow_plus_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = OracleEEMFlowPlus(groups=3, n_first_channels=15).eval()

    rng = np.random.default_rng(0)
    H, W = 96, 128
    ev1 = (rng.standard_normal((1, 15, H, W)) * 0.5).astype(np.float32)
    ev2 = (rng.standard_normal((1, 15, H, W)) * 0.5).astype(np.float32)

    with torch.no_grad():
        refs = [p.numpy() for p in oracle(torch.from_numpy(ev1), torch.from_numpy(ev2))]

    sd = {k: v.numpy() for k, v in oracle.state_dict().items() if k != "index"}
    sd = filter_state_dict(sd, EEMFLOW_PLUS_DROP)
    variables = torch_state_dict_to_flax(sd, alias=eemflow_plus_alias)

    model = EEMFlowPlus(groups=3, n_first_channels=15)
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b)[1])
    flows = fwd(
        variables,
        jnp.asarray(ev1.transpose(0, 2, 3, 1)),
        jnp.asarray(ev2.transpose(0, 2, 3, 1)),
    )
    assert len(flows) == 5
    # Tolerance note: flow values are rescaled by up to 32× at the coarsest
    # level's upsampling, and the reference's WarpingLayer_no_div ones-mask
    # threshold is fp-borderline on a few samples (see
    # tests/test_ops_golden.py::test_backwarp_masked) — allow ~1e-2 absolute.
    for i, (got, ref) in enumerate(zip(flows, refs)):
        g = np.asarray(got).transpose(0, 3, 1, 2)
        assert g.shape == ref.shape
        np.testing.assert_allclose(g, ref, atol=2e-2, err_msg=f"prediction {i}")
        diff = np.abs(g - ref)
        assert np.quantile(diff, 0.9) < 2e-3, (
            f"prediction {i}: q90 {np.quantile(diff, 0.9)}"
        )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
