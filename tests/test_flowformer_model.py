"""FlowFormer checkpoint parity: torch oracle (reference architecture /
state_dict layout incl. the dead GMA pos_emb tables) → converter → flax
forward must match across all decoder iterations.

The reference's shipped FlowFormer is only constructible with 3-channel
input (LatentCostFormer/cnn.py:122); the parity test matches that."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from eemflow_tpu.compat import torch_state_dict_to_flax
from eemflow_tpu.compat.torch_loader import filter_state_dict, flowformer_alias
from eemflow_tpu.models.flowformer import FLOWFORMER_DROP, FlowFormer

from torch_oracles import OracleFlowFormer


@pytest.mark.zoo
def test_flowformer_matches_torch_oracle():
    torch.manual_seed(0)
    decoder_depth = 3  # recurrence parity is established by 3 iterations
    oracle = OracleFlowFormer(cin=3, encoder_depth=3,
                              decoder_depth=decoder_depth).eval()

    rng = np.random.default_rng(0)
    H, W = 64, 96  # multiples of 32: padding is identity
    ev1 = (rng.standard_normal((1, 3, H, W)) * 0.5).astype(np.float32)
    ev2 = (rng.standard_normal((1, 3, H, W)) * 0.5).astype(np.float32)

    with torch.no_grad():
        ref_list = oracle(torch.from_numpy(ev1), torch.from_numpy(ev2))
    ref = np.stack([p.numpy() for p in ref_list])

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    # the dead relative-position tables must be present in the raw dict and
    # removed by the documented drop list
    assert any(k.startswith(FLOWFORMER_DROP[0]) for k in sd)
    sd = filter_state_dict(sd, FLOWFORMER_DROP)
    variables = torch_state_dict_to_flax(sd, alias=flowformer_alias)

    model = FlowFormer(n_first_channels=3, decoder_depth=decoder_depth)
    _, flows = model.apply(
        variables,
        jnp.asarray(ev1.transpose(0, 2, 3, 1)),
        jnp.asarray(ev2.transpose(0, 2, 3, 1)),
    )
    got = np.asarray(flows).transpose(0, 1, 4, 2, 3)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-3)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
