"""Per-model-family input/loss adapters — the functional rebuild of the
reference's trainer/tester subclasses (``train_mvsec.py:352-1258``,
``test_mvsec.py:1395-2039``).

The reference encodes each family's input contract and loss in a subclass
pair (``TrainRaftEvents``/``TestRaftEvents`` etc.); here each family is one
:class:`Family` object used by both ``make_train_step`` and ``Tester`` —
every method is jit-traceable (called inside the compiled step).

Families and their reference sources:

  * ``two_volume``    — ``model(ev_old, ev_new)``, sequence loss
    (``TrainRaftEvents`` ``train_mvsec.py:375-386`` — the HREM entry path).
  * ``single_volume`` — ``model(event_volume)`` with trailing time groups
    (``TrainSteRaft:352`` / ``TestSteRaft:1513``; STE-FlowNet + spiking
    FlowNetS).
  * ``seg_events``    — ``model(event_raw)`` raw event segments
    (``TrainRaftSegEvents:389`` / ``TestRaftSegEvents:1457``; gma_rnn,
    event-transformer models).  The reference passes ``(event_raw,
    event_volume)``; the rebuilt RAFTGMA_RNN synthesizes its images from
    the raw segments alone, so the volume is not an input.
  * ``event_image``   — ``model(event_volume, image1)``
    (``TestDCEI:1877``; DCEIFlow).
  * ``dense_sparse``  — two volumes in, UNet-reconstruction regularizer:
    ``dice_reg(cat(d1,d2), cat(map1,map2)) + 100·flow``
    (``TrainDenseSparse.compute_loss`` ``train_mvsec.py:528-543``).
  * ``dense_ctx``     — sparse volumes + dense context volumes
    (``run_network_with_dense:505-516``).  The reference's
    ``compute_ctx_loss`` "reg" term compares the *inputs* to each other
    (no parameters — zero gradient), so the effective objective is the
    flow term; we use the flow loss with the reference's 100× weight.
  * ``mimounet``      — MIMO-UNet multiscale reconstruction + density:
    ``Σ dice_reg(scale) + 50·density + 200·flow``
    (``compute_mimounet_loss_with_density`` ``train_mvsec.py:623-660``).
  * ``gmflownet``     — sequence loss + 0.01 · coarse matching loss on the
    softCorrMap, occlusion map from ``|mean_c(im1 − backwarp(im2, gt))|>20``
    (``TrainGMflownet.sequence_loss`` ``train_mvsec.py:1215-1258``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from eemflow_tpu.train.loss import sequence_loss
from eemflow_tpu.train.losses_extra import (
    compute_coarse_loss,
    compute_supervision_coarse,
    density_loss,
    dice_reg,
)


class Family:
    """Base adapter: the ``two_volume`` contract (reference
    ``TrainRaftEvents.run_network``, ``train_mvsec.py:375-386``)."""

    name = "two_volume"

    def model_args(self, batch: Dict[str, jax.Array]) -> Tuple:
        """Positional inputs for ``model.apply`` drawn from the batch."""
        return (batch["event_volume_old"], batch["event_volume_new"])

    def compute_loss(self, outputs, batch, gamma: float = 0.8):
        """(maps, preds) → (loss, metrics)."""
        _, preds = outputs
        return sequence_loss(preds, batch["flow"], batch["valid"], gamma)

    def flow_est(self, outputs) -> jax.Array:
        """Final flow prediction (reference ``flow_list[-1]``)."""
        _, preds = outputs
        return preds[-1]


class SingleVolumeFamily(Family):
    """``model(event_volume)`` — STE/spike stacks with trailing time groups
    (reference ``TrainSteRaft.run_network``, ``train_mvsec.py:364-372``)."""

    name = "single_volume"

    def model_args(self, batch):
        return (batch["event_volume"],)


class SegEventsFamily(Family):
    """``model(event_raw)`` raw event segments (reference
    ``TrainRaftSegEvents.run_network``, ``train_mvsec.py:407-413``)."""

    name = "seg_events"

    def model_args(self, batch):
        return (batch["event_raw"],)


class EventImageFamily(Family):
    """``model(event_volume, image1)`` (reference ``TestDCEI.run_network``,
    ``test_mvsec.py:1908-1916``)."""

    name = "event_image"

    def model_args(self, batch):
        return (batch["event_volume"], batch["image1"])


class DenseSparseFamily(Family):
    """UNet-reconstruction training: ``reg + 100·flow`` (reference
    ``TrainDenseSparse.compute_loss``, ``train_mvsec.py:528-543``).

    Expects ``d_event_volume_old/new`` dense targets in the batch; the
    model's maps are the (enhanced1, enhanced2) pair."""

    name = "dense_sparse"
    flow_weight = 100.0

    def compute_loss(self, outputs, batch, gamma: float = 0.8):
        from eemflow_tpu.train.losses_extra import unite_reconstruction_loss

        maps, preds = outputs
        unet_out = jnp.concatenate([maps[0], maps[1]], axis=0)
        dense = jnp.concatenate(
            [batch["d_event_volume_old"], batch["d_event_volume_new"]], axis=0
        )
        return unite_reconstruction_loss(
            preds, batch["flow"], batch["valid"], unet_out, dense,
            gamma=gamma, flow_weight=self.flow_weight,
        )


class DenseCtxFamily(Family):
    """Sparse volumes through fnet, dense volumes as context (reference
    ``run_network_with_dense``, ``train_mvsec.py:505-516``).  The
    reference's reg term carries no gradient (see module docstring); the
    100× flow weight is kept so loss magnitudes are comparable."""

    name = "dense_ctx"
    flow_weight = 100.0

    def model_args(self, batch):
        return (
            batch["event_volume_old"],
            batch["event_volume_new"],
            batch["d_event_volume_old"],
            batch["d_event_volume_new"],
        )

    def compute_loss(self, outputs, batch, gamma: float = 0.8):
        _, preds = outputs
        flow_loss, metrics = sequence_loss(preds, batch["flow"], batch["valid"], gamma)
        metrics = dict(metrics)
        metrics["flow_loss"] = flow_loss
        return self.flow_weight * flow_loss, metrics


class MimoUNetFamily(Family):
    """MIMO-UNet multiscale reconstruction + density + flow (reference
    ``compute_mimounet_loss_with_density``, ``train_mvsec.py:623-660``):
    ``Σ_scales dice_reg + 50·density(finest) + 200·flow``."""

    name = "mimounet"
    density_weight = 50.0
    flow_weight = 200.0

    def compute_loss(self, outputs, batch, gamma: float = 0.8):
        from eemflow_tpu.ops.upsample import resize_bilinear

        maps, preds = outputs
        # maps: [(o1_s4, o2_s4), (o1_s2, o2_s2), (o1_full, o2_full)]
        dense = jnp.concatenate(
            [batch["d_event_volume_old"], batch["d_event_volume_new"]], axis=0
        )
        H, W = dense.shape[1:3]
        targets = [
            resize_bilinear(dense, (H // 4, W // 4)),
            resize_bilinear(dense, (H // 2, W // 2)),
            dense,
        ]
        reg = sum(
            dice_reg(jnp.concatenate([m1, m2], axis=0), t)
            for (m1, m2), t in zip(maps, targets)
        )
        pred_finest = jnp.concatenate([maps[-1][0], maps[-1][1]], axis=0)
        reg = reg + self.density_weight * density_loss(pred_finest, dense)
        flow_loss, metrics = sequence_loss(preds, batch["flow"], batch["valid"], gamma)
        metrics = dict(metrics)
        metrics["reg_loss"] = reg
        metrics["flow_loss"] = flow_loss
        return reg + self.flow_weight * flow_loss, metrics


class GMFlowNetFamily(Family):
    """Sequence loss + 0.01 · coarse matching loss (reference
    ``TrainGMflownet.sequence_loss``, ``train_mvsec.py:1215-1258``).

    In train mode the model returns ``(flows, soft_corr_map)``; occlusion =
    ``|mean_c(im1 − backwarp(im2, flow_gt))| > 20`` at full resolution,
    supervision built at the /8 coarse scale."""

    name = "gmflownet"
    match_weight = 0.01
    occ_threshold = 20.0

    def compute_loss(self, outputs, batch, gamma: float = 0.8):
        from eemflow_tpu.ops.warp import backwarp

        _, (preds, soft_corr_map) = outputs
        im1 = batch["event_volume_old"]
        im2 = batch["event_volume_new"]
        flow_gt = batch["flow"]

        flow_loss, metrics = sequence_loss(preds, flow_gt, batch["valid"], gamma)

        img_2back1 = backwarp(im2, flow_gt)
        occ = jnp.abs(jnp.mean(im1 - img_2back1, axis=-1)) > self.occ_threshold
        conf_gt = compute_supervision_coarse(flow_gt, occ.astype(jnp.float32), 8)
        match = compute_coarse_loss(soft_corr_map, conf_gt, "cross_entropy")
        metrics = dict(metrics)
        metrics["match_loss"] = match
        return flow_loss + self.match_weight * match, metrics

    def flow_est(self, outputs):
        maps, preds = outputs
        if isinstance(preds, tuple):  # train-mode (flows, soft_corr_map)
            preds = preds[0]
        return preds[-1]


FAMILIES: Dict[str, Family] = {
    f.name: f
    for f in [
        Family(),
        SingleVolumeFamily(),
        SegEventsFamily(),
        EventImageFamily(),
        DenseSparseFamily(),
        DenseCtxFamily(),
        MimoUNetFamily(),
        GMFlowNetFamily(),
    ]
}

# model registry name → family (reference CLI registry mapping,
# ``train_EEMFlow_HREM.py:30-55`` + per-model trainer picks in
# ``train_mvsec.py``/``test_mvsec.py``)
MODEL_FAMILY: Dict[str, str] = {
    "eemflow": "two_volume",
    "eemflow_plus": "two_volume",
    "eraft": "two_volume",
    "gma": "two_volume",
    "gmflow": "two_volume",
    "flowformer": "two_volume",
    "kpaflow": "two_volume",
    "skflow": "two_volume",
    "irrpwc": "two_volume",
    "irrpwc_occ": "two_volume",
    # full IRR-PWC variant surface (model/IRRPWC/*.py) — all two-volume
    "pwcnet": "two_volume",
    "pwcnet_bi": "two_volume",
    "pwcnet_occ": "two_volume",
    "pwcnet_occ_bi": "two_volume",
    "pwcnet_irr_bi": "two_volume",
    "pwcnet_irr_occ": "two_volume",
    "pwcnet_irr_occ_bi": "two_volume",
    "flownet1s": "two_volume",
    "flownet1s_irr": "two_volume",
    "flownet1s_irr_bi": "two_volume",
    "flownet1s_irr_occ": "two_volume",
    "flownet1s_irr_occ_bi": "two_volume",
    "irr_flownet": "two_volume",
    "unite_pwcnet_irr": "two_volume",
    "raft": "two_volume",
    "unite_denoise_raft": "two_volume",
    "gmflownet": "gmflownet",
    "unite_unet_raft": "dense_sparse",
    "unite_densectx_raft": "dense_ctx",
    "unite_mimounet_raft": "mimounet",
    # unite zoo frontends (MIMO-UNet-little + SK over the zoo backbones) —
    # same 3-scale maps + flows contract, trained like the MIMO-UNet
    # reconstruction models (reference TrainDenseSparse.train_mimounet_iters)
    "unite_gma": "mimounet",
    "unite_gma_in": "mimounet",
    "unite_gmflow": "mimounet",
    "unite_gmflownet": "mimounet",
    "unite_gmflownet_in": "mimounet",
    "unite_flowformer": "mimounet",
    "unite_sknet": "mimounet",
    "unite_sknet_in": "mimounet",
    "unite_kpa": "mimounet",
    "unite_kpa_in": "mimounet",
    "dceiflow": "event_image",
    "steflow": "single_volume",
    "spikeflownet": "single_volume",
    "gma_rnn": "seg_events",
    # "event_transformer" is a feature extractor consumed by gma_rnn, not a
    # standalone flow model — no family entry.
}


def get_family(name_or_family) -> Family:
    """Resolve a family by family name, model registry name (reference CLI
    alias spellings accepted), or instance."""
    if isinstance(name_or_family, Family):
        return name_or_family
    if name_or_family in FAMILIES:
        return FAMILIES[name_or_family]
    from eemflow_tpu.models.registry import ALIASES

    name = ALIASES.get(name_or_family, name_or_family)
    if name in MODEL_FAMILY:
        return FAMILIES[MODEL_FAMILY[name]]
    raise KeyError(
        f"Unknown family/model '{name_or_family}'. Families: {sorted(FAMILIES)}; "
        f"models: {sorted(MODEL_FAMILY)}"
    )
