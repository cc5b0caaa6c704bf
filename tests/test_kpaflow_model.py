"""KPAFlow checkpoint parity: torch oracle (kernel-patch attention encoder
+ decoder, reference KPAflow/module.py) → converter → flax scan forward.

The reference's own forward is dead code upstream (missing MIMO_unet import
+ returns a raw 1/8 flow); the oracle implements its per-iteration math and
applies the standard upflow8 so the comparison covers every iterate."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from eemflow_tpu.compat import torch_state_dict_to_flax
from eemflow_tpu.compat.torch_loader import digit_merge_alias, filter_state_dict
from eemflow_tpu.models.kpaflow import KPAFlow

from torch_oracles import OracleKPAFlow


@pytest.mark.zoo
def test_kpaflow_matches_torch_oracle():
    torch.manual_seed(0)
    iters = 3
    oracle = OracleKPAFlow(cin=5).eval()

    rng = np.random.default_rng(0)
    # 8x12 at 1/8 → KPA pads to 13/19 multiples, exercising the
    # out-of-frame mask and the pad-a-full-extra-patch quirk
    H, W = 64, 96
    ev1 = (rng.standard_normal((1, 5, H, W)) * 0.5).astype(np.float32)
    ev2 = (rng.standard_normal((1, 5, H, W)) * 0.5).astype(np.float32)

    with torch.no_grad():
        ref_list = oracle(torch.from_numpy(ev1), torch.from_numpy(ev2), iters=iters)
    ref = np.stack([p.numpy() for p in ref_list])

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    assert "zero" in sd  # the reference's frozen root-level param
    sd = filter_state_dict(sd, ("zero",))
    variables = torch_state_dict_to_flax(sd, alias=digit_merge_alias)

    model = KPAFlow(n_first_channels=5, iters=iters)
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
