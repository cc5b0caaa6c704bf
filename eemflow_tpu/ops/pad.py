"""Input padding to network-friendly sizes.

Parity targets (semantics re-derived from the reference, not copied):
  * ``InputPadder`` — reference ``utils/image_utils.py:126-145``: replicate-pad
    H/W up to the next multiple of ``eval_pad_rate`` (32 default; EEMFlow uses
    64).  Mode 'sintel' centers the pad; mode 'chairs' pads bottom + split
    left/right.  NOTE the reference computes the pad with an always-round-up
    formula then takes ``% rate``, which equals "pad to next multiple".
  * ``ImagePadder`` — reference ``utils/image_utils.py:86-124``: zero-pad
    top/left, remembered from the first call.

Arrays are NHWC (TPU-native layout). ``pad``/``unpad`` are shape-static and
safe under ``jit``.
"""

from __future__ import annotations

import jax.numpy as jnp


class InputPadder:
    """Pads NHWC images so H and W are divisible by ``eval_pad_rate``."""

    def __init__(self, dims, mode: str = "sintel", eval_pad_rate: int = 32):
        self.eval_pad_rate = eval_pad_rate
        self.ht, self.wd = dims[-2], dims[-1]
        r = eval_pad_rate
        pad_ht = (((self.ht // r) + 1) * r - self.ht) % r
        pad_wd = (((self.wd // r) + 1) * r - self.wd) % r
        if mode == "sintel":
            # [left, right, top, bottom]
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2]
        elif mode == "downscale":
            # bottom/right only — rebuild extension for models that return
            # MULTI-SCALE outputs: with zero left/top offsets, a scale-s
            # output unpads by simple prefix slicing [:H//s, :W//s], which a
            # full-res offset unpad gets wrong (the reference applies
            # full-res unpad to coarse maps, model/unite_unet_raft.py:459-462
            # — a latent shape bug at non-multiple-of-rate sizes)
            self._pad = [0, pad_wd, 0, pad_ht]
        else:  # 'chairs'
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    @property
    def padded_shape(self):
        l, r, t, b = self._pad
        return (self.ht + t + b, self.wd + l + r)

    def pad(self, *inputs):
        """Replicate-pad each NHWC array; returns a list like the reference."""
        l, r, t, b = self._pad
        out = [
            jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge") for x in inputs
        ]
        return out

    def unpad(self, x):
        """Remove padding; works on [..., H, W, C] with any leading dims."""
        l, r, t, b = self._pad
        ht, wd = x.shape[-3], x.shape[-2]
        return x[..., t : ht - b, l : wd - r, :]


class ImagePadder:
    """Zero-pads top/left to a multiple of ``min_size`` (NHWC)."""

    def __init__(self, min_size: int = 64):
        self.min_size = min_size
        self.pad_height = None
        self.pad_width = None

    def pad(self, image):
        height, width = image.shape[1], image.shape[2]
        if self.pad_width is None:
            self.pad_height = (self.min_size - height % self.min_size) % self.min_size
            self.pad_width = (self.min_size - width % self.min_size) % self.min_size
        return jnp.pad(
            image,
            ((0, 0), (self.pad_height, 0), (self.pad_width, 0), (0, 0)),
            mode="constant",
        )

    def unpad(self, image):
        return image[:, self.pad_height :, self.pad_width :, :]
