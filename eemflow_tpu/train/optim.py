"""Optimizer: AdamW + OneCycle LR + grad clipping (optax).

Mirrors the reference recipe (``train_mvsec.py:178-183``): AdamW(lr, wd, eps)
with ``OneCycleLR(max_lr=lr, total_steps=num_steps+100, pct_start=0.05,
anneal_strategy='linear')`` and grad-norm clip 1.0 applied before the step.
AMP/GradScaler is unnecessary on TPU (bf16 needs no loss scaling).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def onecycle_lr(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.05,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
):
    """torch OneCycleLR with linear annealing (two linear phases).

    initial = max_lr/div_factor, final = initial/final_div_factor;
    warm-up ends at float(pct_start·total) − 1 steps (torch convention).
    """
    initial = max_lr / div_factor
    final = initial / final_div_factor
    warm_end = float(pct_start * total_steps) - 1.0
    total_end = float(total_steps - 1)

    def schedule(step):
        s = jnp.minimum(jnp.asarray(step, jnp.float32), total_end)
        up = initial + (max_lr - initial) * jnp.clip(s / jnp.maximum(warm_end, 1e-8), 0, 1)
        down = max_lr + (final - max_lr) * jnp.clip(
            (s - warm_end) / jnp.maximum(total_end - warm_end, 1e-8), 0, 1
        )
        return jnp.where(s <= warm_end, up, down)

    return schedule


def make_optimizer(
    lr: float,
    wdecay: float = 0.0,
    epsilon: float = 1e-8,
    num_steps: int = 100000,
    clip: float = 1.0,
    pct_start: float = 0.05,
) -> optax.GradientTransformation:
    """The reference training recipe as one optax chain."""
    schedule = onecycle_lr(lr, num_steps + 100, pct_start=pct_start)
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=epsilon, weight_decay=wdecay),
    )
