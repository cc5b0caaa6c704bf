"""Frame-based optical flow datasets (reference ``model/GMA/datasets.py:18-269``
— FlyingChairs/FlyingThings3D/Sintel/KITTI/HD1K + ``fetch_dataloader``).

The reference vendors per-model copies of the standard RAFT dataset zoo for
its image baselines; this is the single canonical version.  All datasets
yield dicts shaped like the event loaders (``event_volume_old/new`` carry
the two frames) so the same trainers drive them.
"""

from __future__ import annotations

import os
import os.path as osp
from glob import glob
from typing import Dict, List, Optional

import numpy as np

from eemflow_tpu.data.augment import FlowAugmentor
from eemflow_tpu.events.io import read_flow_any


def read_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path)).astype(np.float32)


def read_flow_kitti(path: str):
    """KITTI 16-bit png flow: (v − 2¹⁵)/64, third channel = valid."""
    import cv2

    fl = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    fl = fl[:, :, ::-1].astype(np.float64)
    flow, valid = fl[:, :, :2], fl[:, :, 2]
    flow = (flow - 2**15) / 64.0
    return flow.astype(np.float32), valid.astype(np.float32)


class FlowDataset:
    """Two-frame + flow dataset base (reference datasets.py:18-80)."""

    def __init__(self, aug_params: Optional[dict] = None, sparse: bool = False,
                 rng=None):
        self.sparse = sparse
        self.augmentor = (
            FlowAugmentor(**aug_params, rng=rng) if aug_params is not None else None
        )
        self.flow_list: List[str] = []
        self.image_list: List[List[str]] = []

    def __len__(self) -> int:
        return len(self.image_list)

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        idx = idx % len(self)
        if self.sparse:
            flow, valid = read_flow_kitti(self.flow_list[idx])
        else:
            flow = read_flow_any(self.flow_list[idx])  # .flo or Things .pfm
            valid = None
        img1 = read_image(self.image_list[idx][0])
        img2 = read_image(self.image_list[idx][1])
        if img1.ndim == 2:
            img1 = np.tile(img1[..., None], (1, 1, 3))
            img2 = np.tile(img2[..., None], (1, 1, 3))

        if self.augmentor is not None and not self.sparse:
            img1, img2, flow = self.augmentor(img1, img2, flow)
        if valid is None:
            valid = ((np.abs(flow[..., 0]) < 1000) & (np.abs(flow[..., 1]) < 1000))
        return {
            "event_volume_old": np.ascontiguousarray(img1, np.float32),
            "event_volume_new": np.ascontiguousarray(img2, np.float32),
            "flow": np.ascontiguousarray(flow, np.float32),
            "valid": np.ascontiguousarray(valid, np.float32),
        }


class FlyingChairs(FlowDataset):
    def __init__(self, root, split="training", aug_params=None, rng=None):
        super().__init__(aug_params, rng=rng)
        images = sorted(glob(osp.join(root, "data", "*.ppm")))
        flows = sorted(glob(osp.join(root, "data", "*.flo")))
        split_file = osp.join(root, "chairs_split.txt")
        split_list = (
            np.loadtxt(split_file, dtype=np.int32)
            if osp.exists(split_file)
            else np.ones(len(flows), np.int32)
        )
        for i in range(len(flows)):
            xid = split_list[i] if i < len(split_list) else 1
            if (split == "training" and xid == 1) or (
                split == "validation" and xid == 2
            ):
                self.flow_list.append(flows[i])
                self.image_list.append([images[2 * i], images[2 * i + 1]])


class FlyingThings3D(FlowDataset):
    def __init__(self, root, dstype="frames_cleanpass", aug_params=None, rng=None):
        super().__init__(aug_params, rng=rng)
        for cam in ["left"]:
            for direction in ["into_future", "into_past"]:
                image_dirs = sorted(glob(osp.join(root, dstype, "TRAIN/*/*")))
                image_dirs = sorted([osp.join(f, cam) for f in image_dirs])
                flow_dirs = sorted(glob(osp.join(root, "optical_flow/TRAIN/*/*")))
                flow_dirs = sorted([osp.join(f, direction, cam) for f in flow_dirs])
                for idir, fdir in zip(image_dirs, flow_dirs):
                    images = sorted(glob(osp.join(idir, "*.png")))
                    flows = sorted(glob(osp.join(fdir, "*.pfm")))
                    for i in range(len(flows) - 1):
                        if direction == "into_future":
                            self.image_list.append([images[i], images[i + 1]])
                            self.flow_list.append(flows[i])
                        else:
                            self.image_list.append([images[i + 1], images[i]])
                            self.flow_list.append(flows[i + 1])


class MpiSintel(FlowDataset):
    def __init__(self, root, split="training", dstype="clean", aug_params=None,
                 rng=None):
        super().__init__(aug_params, rng=rng)
        flow_root = osp.join(root, split, "flow")
        image_root = osp.join(root, split, dstype)
        for scene in sorted(os.listdir(image_root)) if osp.isdir(image_root) else []:
            images = sorted(glob(osp.join(image_root, scene, "*.png")))
            for i in range(len(images) - 1):
                self.image_list.append([images[i], images[i + 1]])
            if split != "test":
                self.flow_list.extend(
                    sorted(glob(osp.join(flow_root, scene, "*.flo")))
                )


class KITTI(FlowDataset):
    def __init__(self, root, split="training", aug_params=None, rng=None):
        super().__init__(aug_params, sparse=True, rng=rng)
        root = osp.join(root, split)
        images1 = sorted(glob(osp.join(root, "image_2", "*_10.png")))
        images2 = sorted(glob(osp.join(root, "image_2", "*_11.png")))
        for im1, im2 in zip(images1, images2):
            self.image_list.append([im1, im2])
        if split == "training":
            self.flow_list = sorted(glob(osp.join(root, "flow_occ", "*_10.png")))


class HD1K(FlowDataset):
    def __init__(self, root, aug_params=None, rng=None):
        super().__init__(aug_params, sparse=True, rng=rng)
        seq_ix = 0
        while True:
            flows = sorted(
                glob(osp.join(root, "hd1k_flow_gt", f"flow_occ/{seq_ix:06d}_*.png"))
            )
            images = sorted(
                glob(osp.join(root, "hd1k_input", f"image_2/{seq_ix:06d}_*.png"))
            )
            if len(flows) == 0:
                break
            for i in range(len(flows) - 1):
                self.flow_list.append(flows[i])
                self.image_list.append([images[i], images[i + 1]])
            seq_ix += 1


def fetch_dataset(stage: str, root: str, aug_params=None, rng=None):
    """Stage → dataset mapping (reference datasets.py:269 fetch_dataloader)."""
    if stage == "chairs":
        return FlyingChairs(root, "training", aug_params, rng)
    if stage == "things":
        return FlyingThings3D(root, aug_params=aug_params, rng=rng)
    if stage == "sintel":
        return MpiSintel(root, "training", "clean", aug_params, rng)
    if stage == "kitti":
        return KITTI(root, "training", aug_params, rng)
    if stage == "hd1k":
        return HD1K(root, aug_params, rng)
    raise ValueError(f"unknown stage {stage}")
