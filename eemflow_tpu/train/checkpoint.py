"""Orbax checkpointing: params + opt_state + step + batch_stats.

Fixes the reference's lossy resume (params+epoch only, optimizer/scheduler
state discarded — ``train_EEMFlow_HREM.py:78-87,127-130``): restoring from
our checkpoints continues the OneCycle schedule exactly where it left off
(the step lives in the optax state and in ``TrainState.step``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp


def _manager(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_checkpoint(directory: str, state, epoch: int) -> None:
    mgr = _manager(directory)
    mgr.save(epoch, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(directory: str, state, epoch: Optional[int] = None):
    """Restore into the structure of ``state`` (abstract target). Returns
    (state, epoch) or (state, 0) if nothing to restore."""
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return state, 0
    mgr = _manager(directory)
    step = epoch if epoch is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        return state, 0
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state)
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return restored, step
