"""Training-engine tests: sequence loss vs torch semantics, OneCycle schedule
vs torch scheduler, a tiny end-to-end train step, checkpoint roundtrip."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from eemflow_tpu.train.loss import sequence_loss
from eemflow_tpu.train.optim import make_optimizer, onecycle_lr

RNG = np.random.default_rng(0)


def test_sequence_loss_matches_torch_formula():
    N, B, H, W = 3, 2, 8, 10
    preds = RNG.standard_normal((N, B, H, W, 2)).astype(np.float32)
    gt = RNG.standard_normal((B, H, W, 2)).astype(np.float32) * 3
    valid = (RNG.random((B, H, W)) > 0.3).astype(np.float32)

    loss, metrics = sequence_loss(jnp.asarray(preds), jnp.asarray(gt), jnp.asarray(valid))

    # torch-semantics oracle (reference train_mvsec.py:201-227)
    tp = [torch.from_numpy(preds[i].transpose(0, 3, 1, 2)) for i in range(N)]
    tg = torch.from_numpy(gt.transpose(0, 3, 1, 2))
    tv = torch.from_numpy(valid)
    mag = torch.sum(tg**2, dim=1).sqrt()
    v = (tv >= 0.5) & (mag < 400)
    ref_loss = 0.0
    for i in range(N):
        w = 0.8 ** (N - i - 1)
        ref_loss += w * (v[:, None] * (tp[i] - tg).abs()).mean()
    epe = torch.sum((tp[-1] - tg) ** 2, dim=1).sqrt().view(-1)[v.view(-1)]
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(float(metrics["epe"]), float(epe.mean()), rtol=1e-5)
    np.testing.assert_allclose(
        float(metrics["1px"]), float((epe < 1).float().mean()), rtol=1e-5
    )


def test_onecycle_matches_torch():
    max_lr, total = 1e-4, 1000
    sched = onecycle_lr(max_lr, total)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=max_lr)
    tsched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr, total, pct_start=0.05, cycle_momentum=False, anneal_strategy="linear"
    )
    torch_lrs = []
    for _ in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        tsched.step()
    got = np.asarray([float(sched(i)) for i in range(total)])
    np.testing.assert_allclose(got, np.asarray(torch_lrs), rtol=2e-3)


def test_train_step_reduces_loss():
    """Tiny EEMFlow: a few AdamW steps on a fixed batch reduce the loss."""
    from eemflow_tpu.models.eemflow import EEMFlow
    from eemflow_tpu.train.trainer import create_train_state, make_train_step

    model = EEMFlow()
    tx = make_optimizer(lr=1e-3, num_steps=100)
    B, H, W = 2, 64, 64
    batch = {
        "event_volume_old": jnp.asarray(RNG.standard_normal((B, H, W, 5)), jnp.float32),
        "event_volume_new": jnp.asarray(RNG.standard_normal((B, H, W, 5)), jnp.float32),
        "flow": jnp.ones((B, H, W, 2), jnp.float32),
        "valid": jnp.ones((B, H, W), jnp.float32),
    }
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(model, tx, donate=False)
    state, m0 = step(state, batch)
    losses = [float(m0["loss"])]
    for _ in range(10):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 11


def test_checkpoint_roundtrip(tmp_path):
    from eemflow_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from eemflow_tpu.train.trainer import TrainState

    state = TrainState(
        step=jnp.asarray(7, jnp.int32),
        params={"w": jnp.arange(6.0).reshape(2, 3)},
        opt_state={"m": jnp.ones((2, 3))},
        batch_stats={},
    )
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state, epoch=3)
    blank = TrainState(
        step=jnp.zeros((), jnp.int32),
        params={"w": jnp.zeros((2, 3))},
        opt_state={"m": jnp.zeros((2, 3))},
        batch_stats={},
    )
    restored, epoch = restore_checkpoint(d, blank)
    assert epoch == 3
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.arange(6.0).reshape(2, 3))
    assert int(restored.step) == 7


def test_trainer_writes_metrics_jsonl(tmp_path):
    """The Trainer emits machine-readable metrics.jsonl records (one per
    log boundary + one per epoch) alongside the reference-style log.txt."""
    import json

    from eemflow_tpu.models.eemflow import EEMFlow
    from eemflow_tpu.train.trainer import Trainer, create_train_state
    from eemflow_tpu.utils.logger import Logger

    model = EEMFlow()
    tx = make_optimizer(lr=1e-3, num_steps=100)
    B, H, W = 1, 64, 64
    batch = {
        "event_volume_old": jnp.asarray(RNG.standard_normal((B, H, W, 5)), jnp.float32),
        "event_volume_new": jnp.asarray(RNG.standard_normal((B, H, W, 5)), jnp.float32),
        "flow": jnp.ones((B, H, W, 2), jnp.float32),
        "valid": jnp.ones((B, H, W), jnp.float32),
    }
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
    logger = Logger(str(tmp_path))
    trainer = Trainer(model, tx, logger=logger, log_every=2)
    trainer.train_iters(state, iter([batch] * 4), start_epoch=0, val_iters=4)

    with open(logger.jsonl_path) as f:
        recs = [json.loads(line) for line in f]
    kinds = [r["kind"] for r in recs]
    assert kinds.count("train") == 2 and kinds.count("epoch") == 1, kinds
    step_rec = next(r for r in recs if r["kind"] == "train")
    assert {"epoch", "step", "loss", "aee", "steps_per_sec"} <= set(step_rec)
    assert isinstance(step_rec["loss"], float)
    ep = next(r for r in recs if r["kind"] == "epoch")
    assert ep["n_steps"] == 4 and ep["mean_loss"] > 0


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
