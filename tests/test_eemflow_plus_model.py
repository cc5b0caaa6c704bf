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


def test_cdc_cfp_matches_torch_oracle():
    """CDCCFPModel (the reference's dead-upstream cdc_cfp_model variant,
    cdc_utils.py:211-288) — CFP attention propagation + blended upsample —
    against a torch oracle through the converter (incl. the
    upsample_output_conv drop path)."""
    from torch_oracles import OracleCDCCFP

    from eemflow_tpu.models.eemflow_plus import CDCCFPModel

    torch.manual_seed(1)
    oracle = OracleCDCCFP().eval()
    rng = np.random.default_rng(1)
    B, H, W = 2, 12, 16
    f1 = (rng.standard_normal((B, 32, H, W)) * 0.5).astype(np.float32)
    f2 = (rng.standard_normal((B, 32, H, W)) * 0.5).astype(np.float32)
    flow = (rng.standard_normal((B, 2, H // 2, W // 2)) * 2).astype(np.float32)

    with torch.no_grad():
        ref = oracle(
            torch.from_numpy(flow), torch.from_numpy(f1), torch.from_numpy(f2)
        ).numpy()

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    sd = filter_state_dict(sd, ("upsample_output_conv",))
    variables = torch_state_dict_to_flax(sd, alias=eemflow_plus_alias)

    model = CDCCFPModel()
    got = model.apply(
        variables,
        jnp.asarray(flow.transpose(0, 2, 3, 1)),
        jnp.asarray(f1.transpose(0, 2, 3, 1)),
        jnp.asarray(f2.transpose(0, 2, 3, 1)),
    )
    # Tolerance: the WarpingLayer_no_div ones-mask threshold is
    # fp-borderline on a few warped samples (verified: every other
    # intermediate — CFP attention, flow upsample, torch_warp — matches
    # to ≤1e-5; the masked warp alone differs at isolated pixels).  Same
    # atol+quantile pattern as test_eemflow_plus_matches_torch_oracle.
    # (measured: 6/768 pixels differ, ≤0.037 — flow here is ±4 px, so a
    # flipped mask pixel carries more than in the SGU test)
    g = np.asarray(got).transpose(0, 3, 1, 2)
    diff = np.abs(g - ref)
    np.testing.assert_allclose(g, ref, atol=5e-2)
    # each flipped pixel taints a dense-estimator receptive field
    # (5 convs → ~11×11), so ~5% of pixels carry small secondary error
    assert np.quantile(diff, 0.9) < 2e-3, np.quantile(diff, 0.9)
    assert (diff > 2e-3).mean() < 0.10, (diff > 2e-3).mean()


def test_eemflow_plus_cfp_variant_forward():
    """EEMFlowPlus(cdc_variant='cfp') builds and runs end-to-end."""
    from eemflow_tpu.models.eemflow_plus import EEMFlowPlus

    rng = np.random.default_rng(2)
    ev = jnp.asarray(rng.standard_normal((1, 64, 64, 15)), jnp.float32)
    model = EEMFlowPlus(cdc_variant="cfp")
    variables = model.init(jax.random.PRNGKey(0), ev, ev)
    assert "cfp" in variables["params"]["cdc_model"]
    _, flows = model.apply(variables, ev, ev)
    assert len(flows) == 5
    assert all(np.isfinite(np.asarray(f)).all() for f in flows)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_eemflow_plus_siamese_stack_parity():
    """siamese_stack is an exact graph restructure (batch-stacked pyramid
    + conv1x1 pairs); outputs match the standard path to fp noise across
    all 5 predictions (conv fp order may vary with batch size, and the
    coarse-to-fine cascade amplifies mildly -> tolerance, not bit-exact)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eemflow_tpu.models.eemflow_plus import EEMFlowPlus

    rng = np.random.default_rng(3)
    ev1 = jnp.asarray(rng.standard_normal((1, 64, 64, 15)), jnp.float32)
    ev2 = jnp.asarray(rng.standard_normal((1, 64, 64, 15)), jnp.float32)
    m0 = EEMFlowPlus()
    var = m0.init(jax.random.PRNGKey(0), ev1, ev2)
    refs = m0.apply(var, ev1, ev2)[1]
    outs = EEMFlowPlus(siamese_stack=True).apply(var, ev1, ev2)[1]
    for i, (a, b) in enumerate(zip(refs, outs)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-3, err_msg=f"pred {i}"
        )
