"""Raw-event point transformer (reference ``model/GMA/ev_transformer_batch.py``).

Operates directly on event point clouds [B, N, 4] (x, y, t, p):

  * **LXformer** — local vector attention over M temporal neighbors
    (consecutive events via a sliding window), subtraction-based scoring
    with a learned relative position encoding,
  * **GXformer** — global vector attention against M farthest-point-sampled
    anchor events,
  * **scatter-back** — attended per-event features vote (×polarity) into an
    [H, W, C] image with the voxel-style nonzero mean/std normalization.

TPU notes: farthest-point sampling is a ``lax.fori_loop`` with masked
arg-max (fixed trip count M — jit-static); the scatter-back reuses the
voxelizer's scatter-add pattern vectorized over channels.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from eemflow_tpu.events.voxel import normalize_voxel_grid


def select_nearest_vector(vect: jax.Array, M: int) -> jax.Array:
    """[B, N, C] → [B, N, M, C]: M consecutive temporal neighbors per event
    (reference ev_transformer_batch.py:10-19)."""
    B, N, C = vect.shape
    pad = M // 2
    vp = jnp.pad(vect, ((0, 0), (pad, pad - 1), (0, 0)))
    return jnp.stack([vp[:, m : m + N, :] for m in range(M)], axis=2)


def farthest_point_sample(points: jax.Array, npoint: int) -> jax.Array:
    """[B, N, C] → [B, npoint, C] (reference ev_transformer_batch.py:21-66:
    first point = farthest from the barycenter, then iterative max-min)."""
    B, N, C = points.shape
    bary = jnp.mean(points, axis=1, keepdims=True)
    d0 = jnp.sum((points - bary) ** 2, axis=-1)
    farthest0 = jnp.argmax(d0, axis=1)  # [B]

    def body(i, state):
        distance, farthest, idxs = state
        idxs = idxs.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(
            points, farthest[:, None, None], axis=1
        )  # [B, 1, C]
        dist = jnp.sum((points - centroid) ** 2, axis=-1)
        distance = jnp.minimum(distance, dist)
        return distance, jnp.argmax(distance, axis=1), idxs

    init = (
        jnp.full((B, N), 1e10, points.dtype),
        farthest0,
        jnp.zeros((B, npoint), jnp.int32),
    )
    _, _, idxs = jax.lax.fori_loop(0, npoint, body, init)
    # the reference extracts samples via masked_select on a 0/1 marker
    # array (ev_transformer_batch.py:61), i.e. in ASCENDING INDEX order —
    # not selection order.  The GX attention pairs anchors from three
    # independent FPS runs (k-, v-, pe-space) by their m position, so the
    # order is semantic and must match for checkpoint parity.
    idxs = jnp.sort(idxs, axis=1)
    return jnp.take_along_axis(points, idxs[..., None], axis=1)


class _VectorAttention(nn.Module):
    """Subtraction-based vector attention shared by LX/GX formers.

    Value aggregation replicates the reference EXACTLY
    (``ev_transformer_batch.py:113-116``): the (B,1,N,M)×(B,Cn,M,N)
    matmul followed by a sum over the last axis collapses the values to
    Σ_n (v_multi+pe)[b,n,m,c] BEFORE the per-position score contraction —
    i.e. every position attends over the same sequence-summed value table
    rather than its own M values.  Almost certainly an upstream slip (the
    per-position form is the commented intent), but checkpoints trained
    on it compute THIS function, so parity requires it; incidentally it
    is also cheaper (the N×M value sum happens once).  The per-position
    variant is one einsum away if ever wanted:
    ``einsum("bnm,bnmc->bnc", scores, v_multi + pe)``."""

    C: int
    Cn: int

    @nn.compact
    def __call__(self, q_multi, k_multi, v_multi, pe):
        # all inputs [B, N, M, Cn] (already projected), pe included in score+value
        sa = nn.Dense(1, use_bias=False, name="w_sa1")(q_multi - k_multi + pe)
        scores = jax.nn.softmax(sa[..., 0], axis=-1)  # [B, N, M]
        value_table = (v_multi + pe).sum(axis=1)  # [B, M, Cn]
        attended = jnp.einsum("bnm,bmc->bnc", scores, value_table)
        return nn.Dense(self.C, use_bias=False, name="w_sa2")(attended)


class LXformer(nn.Module):
    C: int
    Cn: int
    M: int = 8

    @nn.compact
    def __call__(self, x, pe):
        q = nn.Dense(self.Cn, use_bias=False, name="w_qs")(x)
        k = nn.Dense(self.Cn, use_bias=False, name="w_ks")(x)
        v = nn.Dense(self.Cn, use_bias=False, name="w_vs")(x)
        q_multi = jnp.repeat(q[:, :, None], self.M, axis=2)
        k_multi = select_nearest_vector(k, self.M)
        v_multi = select_nearest_vector(v, self.M)
        return _VectorAttention(self.C, self.Cn, name="attn")(
            q_multi, k_multi, v_multi, pe
        )


class GXformer(nn.Module):
    C: int
    Cn: int
    M: int = 8

    @nn.compact
    def __call__(self, x):
        q = nn.Dense(self.Cn, use_bias=False, name="w_qs")(x)
        k = nn.Dense(self.Cn, use_bias=False, name="w_ks")(x)
        v = nn.Dense(self.Cn, use_bias=False, name="w_vs")(x)
        N = x.shape[1]
        pe_raw = jnp.repeat(x[:, :, None], self.M, axis=2) - jnp.repeat(
            farthest_point_sample(x, self.M)[:, None], N, axis=1
        )
        pe = nn.Dense(self.Cn, use_bias=False, name="w_pe")(pe_raw)
        q_multi = jnp.repeat(q[:, :, None], self.M, axis=2)
        k_multi = jnp.repeat(farthest_point_sample(k, self.M)[:, None], N, axis=1)
        v_multi = jnp.repeat(farthest_point_sample(v, self.M)[:, None], N, axis=1)
        return _VectorAttention(self.C, self.Cn, name="attn")(
            q_multi, k_multi, v_multi, pe
        )


class EventTransformer(nn.Module):
    """__call__(events [B, N, 4]) → [B, H, W, C] scattered feature image."""

    C: int = 32
    Cn: int = 64
    M: int = 8
    image_size: tuple = (180, 240)

    @nn.compact
    def __call__(self, events, train: bool = False):
        B, N, _ = events.shape
        H, W = self.image_size

        x = nn.Dense(self.C, use_bias=False, name="mlp_1")(events)
        pe_raw = jnp.repeat(events[:, :, None], self.M, axis=2) - select_nearest_vector(
            events, self.M
        )
        pe = nn.Dense(self.Cn, use_bias=False, name="w_pe")(pe_raw)

        x = x + LXformer(self.C, self.Cn, self.M, name="lx_former")(x, pe)
        x = x + GXformer(self.C, self.Cn, self.M, name="gx_former")(x)

        # scatter features back to the image plane, voting by polarity
        # (epsilon matches torch LayerNorm's 1e-5 for checkpoint parity)
        feat = nn.gelu(
            nn.LayerNorm(epsilon=1e-5, name="LN")(x), approximate=False
        )  # [B, N, C]
        xs = jnp.floor(events[..., 0]).astype(jnp.int32)
        ys = jnp.floor(events[..., 1]).astype(jnp.int32)
        p = events[..., 3]
        inb = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
        idx = jnp.where(inb, ys * W + xs, 0)
        vals = feat * (p * inb.astype(feat.dtype))[..., None]

        def scatter_one(idx_b, vals_b):
            img = jnp.zeros((H * W, self.C), vals_b.dtype)
            img = img.at[idx_b].add(vals_b)
            return img.reshape(H, W, self.C)

        imgs = jax.vmap(scatter_one)(idx, vals)
        imgs = jax.vmap(normalize_voxel_grid)(imgs)
        return imgs
