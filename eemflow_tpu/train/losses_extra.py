"""Auxiliary training losses for the dense/sparse reconstruction and
matching-supervised trainers.

  * ``dice_reg`` — per-sample L2-norm regression between enhanced and dense
    event volumes (reference ``train_mvsec.py:517-527``),
  * ``density_loss`` — L1 between fractions of active pixels (reference
    ``compute_density_loss``, ``train_mvsec.py:604-621``),
  * ``mimounet_multiscale_loss`` — dice_reg at /4, /2, 1 scales against
    bilinear-downsampled dense targets + 50× density term (reference
    ``compute_mimounet_loss_with_density``, ``train_mvsec.py:623-660``),
  * ``unite_reconstruction_loss`` — the composite dense/sparse objective
    (reference ``compute_loss``, ``train_mvsec.py:528-543``:
    reg + 100·flow),
  * ``compute_supervision_coarse`` / ``compute_coarse_loss`` — GMFlowNet's
    GT coarse-match matrix from flow+occlusion and the focal/CE match loss
    (reference ``utils/gmflownet_loss.py:92-139``).

All jit-safe (fixed shapes, where-masking).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from eemflow_tpu.ops.upsample import resize_bilinear
from eemflow_tpu.train.loss import sequence_loss


def dice_reg(x: jax.Array, target: jax.Array) -> jax.Array:
    """mean over batch of ‖x_i − t_i‖₂ (flattened per sample)."""
    B = x.shape[0]
    d = (x - target).reshape(B, -1)
    return jnp.mean(jnp.sqrt(jnp.sum(d**2, axis=1)))


def density_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """|active-pixel fraction difference| summed over batch ([B,H,W,C])."""

    def density(e):
        s = jnp.sum(jnp.abs(e), axis=-1)
        return jnp.mean((s > 0).astype(jnp.float32))

    dp = jax.vmap(density)(pred)
    dt = jax.vmap(density)(target)
    return jnp.sum(jnp.abs(dp - dt))


def mimounet_multiscale_loss(
    preds: Sequence[jax.Array], dense: jax.Array, density_weight: float = 50.0
) -> jax.Array:
    """preds: [out_s4, out_s2, out_full] (coarse→fine NHWC)."""
    B, H, W, C = dense.shape
    d2 = resize_bilinear(dense, (H // 2, W // 2))
    d4 = resize_bilinear(dense, (H // 4, W // 4))
    reg = dice_reg(preds[0], d4) + dice_reg(preds[1], d2) + dice_reg(preds[2], dense)
    return reg + density_weight * density_loss(preds[2], dense)


def unite_reconstruction_loss(
    flow_preds,
    flow_gt,
    valid,
    unet_out: jax.Array,
    dense_target: jax.Array,
    gamma: float = 0.8,
    flow_weight: float = 100.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """reg_loss + flow_weight · sequence_loss (reference compute_loss)."""
    reg = dice_reg(unet_out, dense_target)
    flow_loss, metrics = sequence_loss(flow_preds, flow_gt, valid, gamma)
    metrics = dict(metrics)
    metrics["reg_loss"] = reg
    metrics["flow_loss"] = flow_loss
    return reg + flow_weight * flow_loss, metrics


def compute_supervision_coarse(flow: jax.Array, occlusions: jax.Array, scale: int):
    """GT coarse confidence matrix [B, HcWc, HcWc]
    (reference gmflownet_loss.py:92-116).

    flow: [B, H, W, 2]; occlusions: [B, H, W] (1 = occluded)."""
    B, H, W, _ = flow.shape
    Hc, Wc = -(-H // scale), -(-W // scale)
    occ_c = occlusions[:, ::scale, ::scale].reshape(B, Hc * Wc)
    flow_c = flow[:, ::scale, ::scale, :] / scale

    gx = jnp.tile(jnp.arange(Wc)[None, :], (Hc, 1)).reshape(-1)
    gy = jnp.tile(jnp.arange(Hc)[:, None], (1, Wc)).reshape(-1)
    wx = jnp.round(gx[None] + flow_c[..., 0].reshape(B, -1)).astype(jnp.int32)
    wy = jnp.round(gy[None] + flow_c[..., 1].reshape(B, -1)).astype(jnp.int32)
    oob = (wx < 0) | (wx >= Wc) | (wy < 0) | (wy >= Hc)
    occ_c = jnp.where(oob, 1.0, occ_c)
    j_ids = jnp.clip(wx + wy * Wc, 0, Hc * Wc - 1)

    valid = occ_c == 0
    conf_gt = jnp.zeros((B, Hc * Wc, Hc * Wc))
    one_hot = jax.nn.one_hot(j_ids, Hc * Wc) * valid[..., None]
    return conf_gt + one_hot


def compute_coarse_loss(
    conf: jax.Array,
    conf_gt: jax.Array,
    coarse_type: str = "cross_entropy",
    pos_weight: float = 1.0,
    neg_weight: float = 1.0,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
) -> jax.Array:
    """Match-confidence loss (reference gmflownet_loss.py:118-139)."""
    conf = jnp.clip(conf, 1e-6, 1 - 1e-6)
    pos = conf_gt == 1
    neg = conf_gt == 0
    n_pos = jnp.maximum(jnp.sum(pos), 1)
    n_neg = jnp.maximum(jnp.sum(neg), 1)
    if coarse_type == "cross_entropy":
        loss_pos = jnp.sum(jnp.where(pos, -jnp.log(conf), 0.0)) / n_pos
        loss_neg = jnp.sum(jnp.where(neg, -jnp.log(1 - conf), 0.0)) / n_neg
    elif coarse_type == "focal":
        lp = -focal_alpha * (1 - conf) ** focal_gamma * jnp.log(conf)
        ln = -focal_alpha * conf**focal_gamma * jnp.log(1 - conf)
        loss_pos = jnp.sum(jnp.where(pos, lp, 0.0)) / n_pos
        loss_neg = jnp.sum(jnp.where(neg, ln, 0.0)) / n_neg
    else:
        raise ValueError(coarse_type)
    return pos_weight * loss_pos + neg_weight * loss_neg
