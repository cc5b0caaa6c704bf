"""E-RAFT parity: torch oracle (random weights) → converter → flax scan-loop
forward must match across all iterations."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from eemflow_tpu.compat import torch_state_dict_to_flax
from eemflow_tpu.compat.torch_loader import eraft_alias
from eemflow_tpu.models.eraft import ERAFT

from torch_oracles import OracleERAFT


def test_eraft_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = OracleERAFT(n_first_channels=5).eval()

    rng = np.random.default_rng(0)
    H, W = 40, 56  # non-multiple of 32 exercises 'chairs' padding
    iters = 4
    ev1 = rng.standard_normal((1, 5, H, W)).astype(np.float32) * 0.5
    ev2 = rng.standard_normal((1, 5, H, W)).astype(np.float32) * 0.5

    with torch.no_grad():
        ref_list = oracle(torch.from_numpy(ev1), torch.from_numpy(ev2), iters=iters)
    ref = np.stack([p.numpy() for p in ref_list])  # [iters, B, 2, H, W]

    variables = torch_state_dict_to_flax(
        {k: v.numpy() for k, v in oracle.state_dict().items()}, alias=eraft_alias
    )
    model = ERAFT(n_first_channels=5)
    _, flows = model.apply(
        variables,
        jnp.asarray(ev1.transpose(0, 2, 3, 1)),
        jnp.asarray(ev2.transpose(0, 2, 3, 1)),
        iters=iters,
    )
    got = np.asarray(flows).transpose(0, 1, 4, 2, 3)  # [iters, B, 2, H, W]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-3)
    # final prediction tighter
    np.testing.assert_allclose(got[-1], ref[-1], atol=5e-3)


def test_eraft_final_only_upsample_parity():
    """Eval-throughput mode (``upsample_all=False``: convex-upsample only the
    final iterate) must return exactly the same final flow as the default
    all-iterations mode, with an identical parameter tree so checkpoints
    load either way (``models/registry.get_eval_model``)."""
    import jax

    rng = np.random.default_rng(1)
    ev1 = jnp.asarray(rng.standard_normal((1, 40, 56, 5)), jnp.float32)
    ev2 = jnp.asarray(rng.standard_normal((1, 40, 56, 5)), jnp.float32)

    full = ERAFT(n_first_channels=5)
    variables = full.init(jax.random.PRNGKey(0), ev1, ev2, iters=3)

    from eemflow_tpu.models.registry import get_eval_model

    fast = get_eval_model("eraft", n_first_channels=5)
    assert fast.upsample_all is False
    # same param tree: init of the eval-mode model matches
    fast_vars = fast.init(jax.random.PRNGKey(0), ev1, ev2, iters=3)
    assert jax.tree_util.tree_structure(fast_vars) == jax.tree_util.tree_structure(
        variables
    )

    _, flows_full = full.apply(variables, ev1, ev2, iters=3)
    _, flows_fast = fast.apply(variables, ev1, ev2, iters=3)
    assert flows_fast.shape[0] == 1
    np.testing.assert_array_equal(
        np.asarray(flows_fast[-1]), np.asarray(flows_full[-1])
    )


def test_eraft_siamese_stack_parity():
    """``siamese_stack=True`` (fnet on both volumes as one 2B-batch call —
    the round-5 out-of-loop serving lever) is an exact graph restructure:
    convs are batch-parallel and instance norm is per-sample, so the flow
    must match the default two-call forward bit-for-bit, with an identical
    param tree so checkpoints load either way."""
    import jax

    rng = np.random.default_rng(2)
    ev1 = jnp.asarray(rng.standard_normal((2, 40, 56, 5)), jnp.float32)
    ev2 = jnp.asarray(rng.standard_normal((2, 40, 56, 5)), jnp.float32)

    base = ERAFT(n_first_channels=5)
    variables = base.init(jax.random.PRNGKey(0), ev1, ev2, iters=3)
    stacked = ERAFT(n_first_channels=5, siamese_stack=True)
    svars = stacked.init(jax.random.PRNGKey(0), ev1, ev2, iters=3)
    assert jax.tree_util.tree_structure(svars) == jax.tree_util.tree_structure(
        variables
    )

    _, flows_base = base.apply(variables, ev1, ev2, iters=3)
    _, flows_stacked = stacked.apply(variables, ev1, ev2, iters=3)
    np.testing.assert_array_equal(
        np.asarray(flows_stacked), np.asarray(flows_base)
    )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
