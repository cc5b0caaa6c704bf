"""eemflow_tpu — TPU-native event-camera optical-flow / meshflow framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
boomluo02/EEMFlow (CVPR 2024, "Efficient Meshflow and Optical Flow Estimation
from Event Cameras"): event-stream voxelization, a zoo of two-frame optical
flow networks adapted to event voxel pairs, meshflow regression, and
MVSEC/HREM evaluation protocols.

Design stance (TPU-first, not a port):
  * pure-functional models (flax.linen) with NHWC layouts feeding the MXU,
  * device-side event voxelization via XLA scatter / Pallas,
  * iterative RAFT-style refinement as `lax.scan` (no host round trips),
  * data parallelism via `jax.sharding.Mesh` + NamedSharding (XLA collectives
    over ICI), optional spatial sharding of high-res activations,
  * orbax checkpoints carrying params + optimizer state + step (fixing the
    reference's lossy resume, see reference train_EEMFlow_HREM.py:127-130).
"""

__version__ = "0.3.0"
