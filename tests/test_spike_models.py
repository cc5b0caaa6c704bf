"""Spiking-net checkpoint parity: torch oracles (reference
spikemodel/FlowNetS_spike.py via the ``spike_flownets`` constructor and
STEmodel/STEFlow.py via ``steflow`` — both batchNorm=False, the only
constructible configuration) → converter → flax forward."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from eemflow_tpu.compat import torch_state_dict_to_flax
from eemflow_tpu.compat.torch_loader import (
    SPIKE_TCONV_PATHS,
    STE_DROP,
    filter_state_dict,
    ste_alias,
)
from eemflow_tpu.models.spike import STEFlowNet, SpikeFlowNetS

from torch_oracles import OracleSpikeFlowNetS, OracleSTEFlowNet


@pytest.mark.zoo
def test_spike_flownets_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = OracleSpikeFlowNetS().eval()

    rng = np.random.default_rng(0)
    H = W = 64
    T = 3
    x = (rng.random((1, 4, H, W, T)) > 0.7).astype(np.float32)

    with torch.no_grad():
        ref = oracle(torch.from_numpy(x))[0].numpy()

    variables = torch_state_dict_to_flax(
        {k: v.numpy() for k, v in oracle.state_dict().items()},
        transposed_conv_paths=SPIKE_TCONV_PATHS,
    )
    model = SpikeFlowNetS()
    _, flows = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1, 4)))
    got = np.asarray(flows[0]).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-3)


@pytest.mark.zoo
def test_steflow_matches_torch_oracle():
    torch.manual_seed(0)
    iters = 2
    oracle = OracleSTEFlowNet(num_iterative=iters).eval()

    rng = np.random.default_rng(0)
    H = W = 64
    T = 2
    x = (rng.standard_normal((1, 2, H, W, T)) * 0.5).astype(np.float32)

    with torch.no_grad():
        ref_list = oracle(torch.from_numpy(x), image_resize=H)
    ref = np.stack([p.numpy() for p in ref_list])

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    assert any(k.startswith("flow_deconv") for k in sd)  # dead heads present
    sd = filter_state_dict(sd, STE_DROP)
    variables = torch_state_dict_to_flax(
        sd, alias=ste_alias, transposed_conv_paths=SPIKE_TCONV_PATHS
    )
    model = STEFlowNet(num_iterative=iters)
    _, flows = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1, 4)))
    got = np.stack([np.asarray(f).transpose(0, 3, 1, 2) for f in flows])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-3)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
