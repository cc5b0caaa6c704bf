"""EventTransformer parity: torch oracle (reference
``model/GMA/ev_transformer_batch.py`` semantics, incl. the sequence-summed
value-aggregation quirk and masked_select FPS ordering) → converter →
flax forward."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from eemflow_tpu.compat.torch_loader import convert_for_model
from eemflow_tpu.models.event_transformer import EventTransformer

from torch_oracles import OracleEventTransformer

pytestmark = pytest.mark.zoo


def _events(B, N, H, W, seed=0):
    rng = np.random.default_rng(seed)
    ev = np.empty((B, N, 4), np.float32)
    ev[..., 0] = rng.uniform(0, W - 1e-3, (B, N))          # x
    ev[..., 1] = rng.uniform(0, H - 1e-3, (B, N))          # y
    ev[..., 2] = np.sort(rng.uniform(0, 1, (B, N)), axis=1)  # t
    ev[..., 3] = rng.choice([-1.0, 1.0], (B, N))           # p
    return ev


def test_event_transformer_matches_torch_oracle():
    torch.manual_seed(1)
    H, W, N = 24, 32, 192
    oracle = OracleEventTransformer(C=32, Cn=64, M=8,
                                    image_size=(H, W)).eval()
    ev = _events(2, N, H, W)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(ev)).numpy()  # B C H W

    variables = convert_for_model(
        "event_transformer",
        {k: v.numpy() for k, v in oracle.state_dict().items()},
    )
    model = EventTransformer(C=32, Cn=64, M=8, image_size=(H, W))
    got = np.asarray(model.apply(variables, jnp.asarray(ev)))  # B H W C
    got = got.transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    # knife-edge: a cell whose polarity votes cancel to EXACT 0.0 in torch
    # but ±1e-9 under XLA's summation order flips the nonzero-
    # normalization mask (events_sequence_to_image masks `grid != 0`),
    # shifting that one cell by mean/std.  Inherent to the reference's
    # exact-zero mask, measure-zero in practice — allow isolated cells.
    bad = np.abs(got - ref) > 1e-3
    assert bad.mean() < 1e-4, (
        f"{bad.sum()} / {bad.size} mismatched "
        f"(max {np.abs(got - ref).max()})"
    )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
