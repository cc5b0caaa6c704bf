"""Host-side train-time augmentors (numpy/cv2).

Single canonical implementations of the reference's duplicated augmentor
classes (``loader/loader_utils.py:164-349``, ``utils/augumentor.py:16-433``,
``utils_luo/augumentor.py``):

  * ``FlowAugmentor`` — random log₂-uniform scale (+ optional anisotropic
    stretch), clipped so the crop still fits; h/v flips; random crop; flow
    values rescaled with the image.  ``without_resize=True`` (the HREM path,
    ``utils/augumentor.py:204-241``) applies flips only.
  * ``DenseSparseAugmentor`` — same transform applied jointly to a
    sparse+dense event-volume pair (UNet-reconstruction training).

Reference-bug note (fixed here, not replicated): the HREM loader flips the
event volumes but assigns the *unflipped* meshflow as the training label
(``loader/HREM.py:252-254``); our datasets use the transformed flow that the
augmentor returns.

The eraser transform exists in the reference but is commented out of every
``__call__`` (``loader_utils.py:242-243``); we keep it available but off by
default for the same training behavior.
"""

from __future__ import annotations

import numpy as np


def _resize(img: np.ndarray, fx: float, fy: float) -> np.ndarray:
    import cv2

    return cv2.resize(img, None, fx=fx, fy=fy, interpolation=cv2.INTER_LINEAR)


class FlowAugmentor:
    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5, do_flip=False,
                 spatial_aug_prob=0.8, stretch_prob=0.8, max_stretch=0.2,
                 h_flip_prob=0.5, v_flip_prob=0.1, rng=None):
        self.crop_size = crop_size
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.spatial_aug_prob = spatial_aug_prob
        self.stretch_prob = stretch_prob
        self.max_stretch = max_stretch
        self.do_flip = do_flip
        self.h_flip_prob = h_flip_prob
        self.v_flip_prob = v_flip_prob
        self.rng = rng if rng is not None else np.random.default_rng()

    def _sample_scales(self, ht, wd):
        min_scale = max(
            (self.crop_size[0] + 8) / float(ht), (self.crop_size[1] + 8) / float(wd)
        )
        scale = 2 ** self.rng.uniform(self.min_scale, self.max_scale)
        sx = sy = scale
        if self.rng.random() < self.stretch_prob:
            sx *= 2 ** self.rng.uniform(-self.max_stretch, self.max_stretch)
            sy *= 2 ** self.rng.uniform(-self.max_stretch, self.max_stretch)
        return max(sx, min_scale), max(sy, min_scale)

    def _flips(self, imgs, flow):
        if self.do_flip:
            if self.rng.random() < self.h_flip_prob:
                imgs = [im[:, ::-1] for im in imgs]
                flow = flow[:, ::-1] * [-1.0, 1.0]
            if self.rng.random() < self.v_flip_prob:
                imgs = [im[::-1, :] for im in imgs]
                flow = flow[::-1, :] * [1.0, -1.0]
        return imgs, flow

    def _crop(self, imgs, flow):
        # +1: inclusive high so dim == crop is legal and the bottom/right-most
        # crop is reachable
        y0 = self.rng.integers(0, imgs[0].shape[0] - self.crop_size[0] + 1)
        x0 = self.rng.integers(0, imgs[0].shape[1] - self.crop_size[1] + 1)
        sl = np.s_[y0 : y0 + self.crop_size[0], x0 : x0 + self.crop_size[1]]
        return [im[sl] for im in imgs], flow[sl]

    def draw_flips(self, flow):
        """Raw-event (device-voxelize) mode: draw the h/v flip decisions,
        apply them to the *label* only, and return the flags so the grid
        flips run on device (``data.device_input.flip_batch``).  Uses the
        same rng draw order as ``_flips`` so host/device paths agree for a
        given seed."""
        fh = fv = False
        if self.do_flip:
            if self.rng.random() < self.h_flip_prob:
                fh = True
                flow = flow[:, ::-1] * [-1.0, 1.0]
            if self.rng.random() < self.v_flip_prob:
                fv = True
                flow = flow[::-1, :] * [1.0, -1.0]
        return np.ascontiguousarray(flow), fh, fv

    def draw_crop(self, height, width):
        """Draw a random crop offset for the full frame (device-side crop)."""
        y0 = int(self.rng.integers(0, height - self.crop_size[0] + 1))
        x0 = int(self.rng.integers(0, width - self.crop_size[1] + 1))
        return y0, x0

    def __call__(self, img1, img2, flow, without_resize=False):
        if without_resize:
            (img1, img2), flow = self._flips([img1, img2], flow)
        else:
            ht, wd = img1.shape[:2]
            sx, sy = self._sample_scales(ht, wd)
            if self.rng.random() < self.spatial_aug_prob:
                img1 = _resize(img1, sx, sy)
                img2 = _resize(img2, sx, sy)
                flow = _resize(flow, sx, sy) * [sx, sy]
            (img1, img2), flow = self._flips([img1, img2], flow)
            (img1, img2), flow = self._crop([img1, img2], flow)
        return (
            np.ascontiguousarray(img1),
            np.ascontiguousarray(img2),
            np.ascontiguousarray(flow),
        )


class DenseSparseAugmentor(FlowAugmentor):
    """Joint augmentation of sparse + dense event volume pairs
    (reference ``loader_utils.py:252-349``)."""

    def __call__(self, img1, img2, dimg1, dimg2, flow):
        ht, wd = img1.shape[:2]
        sx, sy = self._sample_scales(ht, wd)
        imgs = [img1, img2, dimg1, dimg2]
        if self.rng.random() < self.spatial_aug_prob:
            imgs = [_resize(im, sx, sy) for im in imgs]
            flow = _resize(flow, sx, sy) * [sx, sy]
        imgs, flow = self._flips(imgs, flow)
        imgs, flow = self._crop(imgs, flow)
        return tuple(np.ascontiguousarray(im) for im in imgs) + (
            np.ascontiguousarray(flow),
        )
