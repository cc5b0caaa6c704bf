"""RAFTGMA_rnn parity: torch oracle (reference ``model/GMA/gma_rnn.py``
semantics — transformer segment images, GRU state carried across
segments, (i+1)/i flow re-initialization, last-segment-only predictions)
→ converter → flax forward."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from eemflow_tpu.compat.torch_loader import convert_for_model
from eemflow_tpu.models.gma_rnn import RAFTGMA_RNN

from torch_oracles import OracleRAFTGMA_rnn

pytestmark = pytest.mark.zoo


def test_gma_rnn_matches_torch_oracle():
    torch.manual_seed(3)
    H, W, N, S, iters = 64, 64, 160, 3, 2
    oracle = OracleRAFTGMA_rnn(n_first_channels=5,
                               image_size=(H, W)).eval()

    rng = np.random.default_rng(7)
    segs = np.empty((1, S, N, 4), np.float32)
    segs[..., 0] = rng.uniform(0, W - 1e-3, (1, S, N))
    segs[..., 1] = rng.uniform(0, H - 1e-3, (1, S, N))
    segs[..., 2] = np.sort(rng.uniform(0, 1, (1, S, N)), axis=-1)
    segs[..., 3] = rng.choice([-1.0, 1.0], (1, S, N))

    with torch.no_grad():
        ref_list = oracle(torch.from_numpy(segs), iters=iters)
    ref = np.stack([p.numpy() for p in ref_list])  # [iters, B, 2, H, W]

    variables = convert_for_model(
        "gma_rnn", {k: v.numpy() for k, v in oracle.state_dict().items()}
    )
    model = RAFTGMA_RNN(n_first_channels=5, image_size=(H, W), iters=iters)
    _, preds = model.apply(variables, jnp.asarray(segs), iters=iters)
    got = np.asarray(preds).transpose(0, 1, 4, 2, 3)
    assert got.shape == ref.shape
    # tolerate isolated exact-zero-mask knife-edge cells from the
    # transformer's nonzero normalization (see test_event_transformer)
    bad = np.abs(got - ref) > 5e-3
    assert bad.mean() < 1e-3, (
        f"{bad.sum()} / {bad.size} mismatched "
        f"(max {np.abs(got - ref).max()})"
    )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
