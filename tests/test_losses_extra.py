"""Auxiliary loss tests vs torch-semantics oracles."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from eemflow_tpu.train.losses_extra import (
    compute_coarse_loss,
    compute_supervision_coarse,
    density_loss,
    dice_reg,
    mimounet_multiscale_loss,
)

RNG = np.random.default_rng(0)


def test_dice_reg_matches_torch():
    x = RNG.standard_normal((3, 8, 8, 5)).astype(np.float32)
    t = RNG.standard_normal((3, 8, 8, 5)).astype(np.float32)
    got = float(dice_reg(jnp.asarray(x), jnp.asarray(t)))
    tx, tt = torch.from_numpy(x), torch.from_numpy(t)
    ref = 0.0
    for i in range(3):
        ref += torch.sum((tx[i].reshape(-1) - tt[i].reshape(-1)) ** 2).sqrt()
    ref = float(ref / 3)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_density_loss():
    pred = np.zeros((2, 4, 4, 3), np.float32)
    tgt = np.zeros((2, 4, 4, 3), np.float32)
    pred[0, 0, 0, 0] = 1.0  # density 1/16 vs 0
    got = float(density_loss(jnp.asarray(pred), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, 1 / 16, rtol=1e-6)


def test_mimounet_multiscale_loss_runs():
    dense = jnp.asarray(RNG.standard_normal((2, 16, 16, 5)), jnp.float32)
    preds = [
        jnp.asarray(RNG.standard_normal((2, 4, 4, 5)), jnp.float32),
        jnp.asarray(RNG.standard_normal((2, 8, 8, 5)), jnp.float32),
        dense + 0.1,
    ]
    loss = float(mimounet_multiscale_loss(preds, dense))
    assert loss > 0


def test_supervision_coarse_and_loss():
    B, H, W, scale = 1, 8, 8, 4
    flow = np.zeros((B, H, W, 2), np.float32)
    flow[..., 0] = 4.0  # shift right by exactly one coarse cell
    occ = np.zeros((B, H, W), np.float32)
    conf_gt = np.asarray(
        compute_supervision_coarse(jnp.asarray(flow), jnp.asarray(occ), scale)
    )
    Hc = Wc = 2
    # each non-occluded source cell matches the cell one to the right;
    # right-column cells fall out of bounds → no positive entry
    assert conf_gt.shape == (B, Hc * Wc, Hc * Wc)
    assert conf_gt[0, 0, 1] == 1 and conf_gt[0, 2, 3] == 1
    assert conf_gt[0, 1].sum() == 0 and conf_gt[0, 3].sum() == 0

    conf = jnp.full((B, Hc * Wc, Hc * Wc), 0.5)
    ce = float(compute_coarse_loss(conf, jnp.asarray(conf_gt), "cross_entropy"))
    np.testing.assert_allclose(ce, -np.log(0.5) * 2, rtol=1e-5)
    fo = float(compute_coarse_loss(conf, jnp.asarray(conf_gt), "focal"))
    assert fo > 0


def test_dsec_flow_16bit_roundtrip():
    from eemflow_tpu.data.dsec import flow_16bit_to_float, flow_to_16bit

    flow = (RNG.standard_normal((6, 8, 2)) * 20).astype(np.float32)
    enc = flow_to_16bit(flow)
    dec, valid = flow_16bit_to_float(enc)
    assert valid.all()
    np.testing.assert_allclose(dec, flow, atol=1 / 128)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_unsup_losses():
    import jax

    from eemflow_tpu.train.unsup_loss import (
        census_loss,
        edge_aware_smoothness_1st,
        edge_aware_smoothness_2nd,
        photo_loss,
        weighted_ssim,
    )

    img = jnp.asarray(RNG.random((1, 16, 16, 3)), jnp.float32)
    flow = jnp.asarray(RNG.standard_normal((1, 16, 16, 2)), jnp.float32)
    mask = jnp.ones((1, 16, 16, 1), jnp.float32)

    # identical images → SSIM distance ~0
    d, _ = weighted_ssim(img, img, mask)
    assert float(jnp.abs(d).max()) < 1e-4
    d2, _ = weighted_ssim(img, img * 0.5 + 0.2, mask)
    assert float(jnp.mean(d2)) > float(jnp.mean(d))

    # constant flow → zero smoothness penalty
    s1 = edge_aware_smoothness_1st(img, jnp.ones_like(flow))
    assert float(s1) < 1e-7
    assert float(edge_aware_smoothness_1st(img, flow)) > 0
    assert float(edge_aware_smoothness_2nd(img, flow)) > 0

    p = photo_loss(img - img, mask)
    p2 = photo_loss(img - (img + 1.0), mask)
    assert float(p2) > float(p)
    assert float(photo_loss(img - img, mask, "charbonnier")) >= 0

    # census: identical images score lower than shifted ones
    c_same = census_loss(img, img, mask)
    c_diff = census_loss(img, jnp.roll(img, 3, axis=2), mask)
    assert float(c_diff) > float(c_same)

    # all differentiable
    g = jax.grad(lambda f: edge_aware_smoothness_1st(img, f))(flow)
    assert np.isfinite(np.asarray(g)).all()
