"""Training losses (reference ``train_mvsec.py:201-227`` sequence_loss).

γ-weighted L1 over the prediction sequence, masked by validity and a
MAX_FLOW=400 magnitude cutoff (``train_mvsec.py:41``); metrics (EPE and
1/3/5-px rates) computed on the final prediction over valid pixels.

jit-safe: masking uses where-sums, not boolean indexing.
"""

from __future__ import annotations

from typing import Dict, List, Tuple, Union

import jax
import jax.numpy as jnp

MAX_FLOW = 400.0


def sequence_loss(
    flow_preds: Union[jax.Array, List[jax.Array]],
    flow_gt: jax.Array,
    valid: jax.Array,
    gamma: float = 0.8,
    max_flow: float = MAX_FLOW,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """flow_preds: [N, B, H, W, 2] stacked or list of [B, H, W, 2];
    flow_gt: [B, H, W, 2]; valid: [B, H, W]."""
    if isinstance(flow_preds, (list, tuple)):
        flow_preds = jnp.stack(flow_preds, axis=0)
    n_predictions = flow_preds.shape[0]

    mag = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    v = (valid >= 0.5) & (mag < max_flow)
    vf = v.astype(flow_preds.dtype)[None, ..., None]  # [1, B, H, W, 1]

    weights = gamma ** jnp.arange(n_predictions - 1, -1, -1, dtype=flow_preds.dtype)
    per_pred = jnp.mean(
        jnp.abs(flow_preds - flow_gt[None]) * vf, axis=(1, 2, 3, 4)
    )  # mean over ALL elements incl. masked (torch .mean() semantics)
    flow_loss = jnp.sum(weights * per_pred)

    epe = jnp.sqrt(jnp.sum((flow_preds[-1] - flow_gt) ** 2, axis=-1))
    n_valid = jnp.maximum(jnp.sum(v), 1)
    vF = v.astype(epe.dtype)

    def rate(thr):
        return jnp.sum((epe < thr) * vF) / n_valid

    metrics = {
        "epe": jnp.sum(epe * vF) / n_valid,
        "1px": rate(1.0),
        "3px": rate(3.0),
        "5px": rate(5.0),
    }
    return flow_loss, metrics
