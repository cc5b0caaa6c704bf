"""Training engine (reference ``train_mvsec.py`` class ``train`` +
``train_iters`` loop, rebuilt functional).

One jit-compiled ``train_step`` carries the whole iteration on device:
forward (all predictions), γ-weighted sequence loss, backward, global-norm
clip, AdamW + OneCycle update — donated state, no host round trips.  Data
parallelism comes from batch-axis sharding on the mesh (XLA inserts the
gradient psum); bf16 forward is a model-policy flag rather than
GradScaler AMP.  Unlike the reference's resume (params+epoch only,
``train_EEMFlow_HREM.py:127-130``), checkpoints carry params, optimizer
state, step and batch_stats (see ``train.checkpoint``).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from eemflow_tpu.train.loss import sequence_loss


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any  # {} for models without BatchNorm


def create_train_state(model, rng, sample_batch, tx) -> TrainState:
    """Initialize params (and batch_stats) from a sample batch."""
    variables = model.init(
        rng, sample_batch["event_volume_old"], sample_batch["event_volume_new"]
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    gamma: float = 0.8,
    donate: bool = True,
) -> Callable:
    """Build the jitted train step: (state, batch) → (state, metrics)."""

    def step_fn(state: TrainState, batch: Dict[str, jax.Array]):
        ev1 = batch["event_volume_old"]
        ev2 = batch["event_volume_new"]
        flow_gt = batch["flow"]
        valid = batch["valid"]

        has_bn = bool(jax.tree_util.tree_leaves(state.batch_stats))

        def loss_fn(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
                (maps, preds), updates = model.apply(
                    variables, ev1, ev2, train=True, mutable=["batch_stats"]
                )
                new_stats = updates["batch_stats"]
            else:
                maps, preds = model.apply(variables, ev1, ev2, train=True)
                new_stats = state.batch_stats
            loss, metrics = sequence_loss(preds, flow_gt, valid, gamma)
            return loss, (metrics, new_stats)

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_stats,
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


class Trainer:
    """Epoch-style loop: run ``val_iters`` steps per epoch, log every 10,
    checkpoint per epoch (reference ``train_iters``, ``train_mvsec.py:229-286``)."""

    def __init__(
        self,
        model,
        tx,
        gamma: float = 0.8,
        logger=None,
        checkpoint_dir: Optional[str] = None,
        log_every: int = 10,
    ):
        self.model = model
        self.tx = tx
        self.gamma = gamma
        self.logger = logger
        self.checkpoint_dir = checkpoint_dir
        self.log_every = log_every
        self.train_step = make_train_step(model, tx, gamma)

    def _log(self, line: str) -> None:
        if self.logger is not None:
            self.logger.write_line(line, verbose=True)
        else:
            print(line, flush=True)

    def train_iters(
        self,
        state: TrainState,
        batches: Iterable[Dict[str, jax.Array]],
        start_epoch: int = 0,
        val_iters: int = 500,
    ) -> TrainState:
        total_loss = 0.0
        total_epe = 0.0
        iters = 0
        t0 = time.time()
        for batch in batches:
            state, metrics = self.train_step(state, batch)
            iters += 1
            total_loss += float(metrics["loss"])
            total_epe += float(metrics["epe"])
            if iters % self.log_every == 0:
                dt = time.time() - t0
                self._log(
                    f"iters{iters + start_epoch * val_iters:06d}  {iters:05d}/{val_iters:05d}"
                    f"  loss:{total_loss / iters:2.6f}  AEE:{total_epe / iters:2.6f}"
                    f"  steps/s:{iters / dt:.2f}"
                )
            if iters >= val_iters:
                break
        self._log(
            f"epoch {start_epoch + 1}: mean loss {total_loss / max(iters, 1):2.6f} "
            f"mean AEE {total_epe / max(iters, 1):2.6f}"
        )
        if self.checkpoint_dir is not None:
            from eemflow_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(self.checkpoint_dir, state, epoch=start_epoch + 1)
        return state
