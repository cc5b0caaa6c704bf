"""Device mesh + sharding layout.

The reference's only parallelism is single-process ``nn.DataParallel``
(``train_EEMFlow_HREM.py:117``).  The TPU-native replacement: a
``jax.sharding.Mesh`` with axes

  * ``data``    — batch-sharded data parallelism (gradient psum inserted by
    XLA under jit; rides ICI within a slice, DCN across slices),
  * ``spatial`` — optional sharding of the image H axis for 1280×720
    activations; XLA SPMD inserts halo exchanges for convolutions
    automatically.

Parameters are replicated (the models are small — ≤10 M params — so
replication beats sharded gather traffic).  No explicit comm backend
exists or is needed: collectives are compiler-inserted (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    assert n_data * n_spatial <= len(devices), (
        f"mesh {n_data}x{n_spatial} needs more than {len(devices)} devices"
    )
    dev_array = np.asarray(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(dev_array, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = None) -> NamedSharding:
    """[B, H, W, C] arrays: batch over 'data', optionally H over 'spatial'."""
    if spatial_axis is None:
        return NamedSharding(mesh, P("data"))
    spec = [None, None, None, None]
    spec[0] = "data"
    spec[spatial_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_constraint(mesh: Mesh, height: int):
    """In-jit spatial resharding for dense [B, H, ...] arrays.

    ``device_put`` refuses shardings whose axis size is not divisible by the
    mesh axis, but ``with_sharding_constraint`` inside jit accepts uneven
    partitions (GSPMD pads the final shard).  So for non-divisible H —
    e.g. 720 rows over a spatial axis of 7, or odd crop heights — the
    batch is fed data-sharded and this hook, composed AFTER the device
    preprocess, pins the H axis to the 'spatial' mesh axis inside the
    compiled step.  Arrays are matched by ``shape[1] == height`` so raw
    event buffers [B, N, 4] stay batch-sharded."""
    dense = NamedSharding(mesh, P("data", "spatial"))

    def constrain(batch):
        def put(x):
            # eager calls (model-init shape inference) pass through: outside
            # jit, with_sharding_constraint is a strict reshard and rejects
            # the uneven split this helper exists for
            if (
                isinstance(x, jax.core.Tracer)
                and getattr(x, "ndim", 0) >= 3
                and x.shape[1] == height
            ):
                return jax.lax.with_sharding_constraint(x, dense)
            return x

        return jax.tree_util.tree_map(put, batch)

    return constrain


def shard_batch(batch, mesh: Mesh):
    """Put a pytree of [B, ...] arrays onto the mesh with batch-axis
    sharding.  Single-host: a plain sharded device_put.  Multi-host (the
    DCN upgrade path, SURVEY §2.7): each process holds its LOCAL batch
    slice and the global array is assembled from per-process shards."""
    sh = NamedSharding(mesh, P("data"))

    if jax.process_count() == 1:
        def put(x):
            return jax.device_put(x, sh)
    else:
        def put(x):
            return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(put, batch)


def init_distributed() -> int:
    """Multi-host entry: initialize the JAX distributed runtime when the
    launcher provides coordination env vars (a no-op single-process).

    The reference has no multi-node path at all (SURVEY §2.8 — single-
    process DataParallel); here one JAX process per host joins a global
    mesh whose 'data' axis spans hosts over DCN — gradient psums are
    compiler-inserted, no comm backend code.  Returns process_count."""
    import os

    if jax.process_count() > 1:
        return jax.process_count()  # already initialized
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or int(
        os.environ.get("JAX_NUM_PROCESSES", "1")
    ) > 1:
        jax.distributed.initialize()
    return jax.process_count()
