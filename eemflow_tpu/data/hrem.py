"""HREM dataset (1280×720 high-res event meshflow, reference ``loader/HREM.py``).

Layout on disk (reference ``HREM.py:154-189``):
  * train: ``{root}/train/{dt}/{name}/{events1.npz, events2.npz, flow.flo}``
  * test:  ``{root}/test/{dt}/{sequence}/{name}/...`` with sequences
    {indoor,outdoor}×{fast,slow}; ``change_test_sequence`` selects one.

Per sample: dense flow → on-the-fly 16×16 meshflow GT
(``data.meshflow.motion_propagate``); events (ns → s in the npz reader,
then ×1e6 to µs, relative) → normalized voxel grids; train applies the
flip-only augmentor (``without_resize``, reference ``HREM.py:252``) —
with the label-flip bug fixed (see ``data.augment``); val bilinearly
upsamples the meshflow to full resolution (align_corners=False,
``HREM.py:266-268``) and masks to finite, nonzero GT.

Arrays are NHWC-per-sample ([H, W, C]); ``event_valid`` is the channel-sum
of the old voxel grid (``HREM.py:238-239``).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from eemflow_tpu.data.augment import FlowAugmentor
from eemflow_tpu.data.meshflow import motion_propagate
from eemflow_tpu.events.io import read_compressed_events, read_flo
from eemflow_tpu.events.sequence import EventSequence
from eemflow_tpu.events.voxel import (
    choose_bucket,
    events_to_voxel_grid_np,
    make_ladder,
)
from eemflow_tpu.ops.upsample import resize_bilinear

HREM_SEQUENCES = ["indoor_fast", "indoor_slow", "outdoor_fast", "outdoor_slow"]


def _bilinear_upsample_np(flow_hw2: np.ndarray, size) -> np.ndarray:
    import jax.numpy as jnp

    out = resize_bilinear(jnp.asarray(flow_hw2[None]), size, align_corners=False)
    return np.asarray(out[0])


class HREMEventFlow:
    image_width = 1280
    image_height = 720

    def __init__(
        self,
        root: str,
        dt: str = "dt1",
        train: bool = True,
        num_bins: int = 5,
        aug_params: Optional[dict] = None,
        eval_type: str = "dense",
        mesh_size: int = 16,
        rng: Optional[np.random.Generator] = None,
        raw_events: bool = False,
        bucket_size: int = 1 << 18,
        full_res_flow: bool = False,
        bucket_rungs: int = 1,
    ):
        self.root = root
        self.dt = dt
        self.type = "train" if train else "val"
        self.num_bins = num_bins
        self.evaluation_type = eval_type
        self.mesh_size = mesh_size
        # full_res_flow: train labels are the dense .flo flow instead of the
        # 16×16 meshflow — lets every full-resolution model in the zoo train
        # on HREM (the reference's HREM trainer only ever works for EEMFlow's
        # mesh-resolution head; other registry models would shape-crash)
        self.full_res_flow = full_res_flow
        self.augmentor = (
            FlowAugmentor(**aug_params, rng=rng) if aug_params is not None else None
        )
        # raw-events mode: emit padded event buffers for device-side
        # voxelization (data.device_input) instead of host voxel grids
        self.raw_events = raw_events
        self.bucket_size = bucket_size
        # bucket ladder (events.voxel.make_ladder): each sample pads to the
        # smallest rung that fits; collate pads the batch to its max rung,
        # so step shapes come from a small static set (bounded recompiles)
        self.bucket_ladder = (
            make_ladder(bucket_size, bucket_rungs) if bucket_rungs > 1
            else (bucket_size,)
        )
        if raw_events:
            from eemflow_tpu.data.device_input import EventOverflowCounter
            from eemflow_tpu.events.voxel import BufferPool

            self.overflow = EventOverflowCounter(f"HREM[{dt}]")
            self._pack_pool = BufferPool()
        self._scan()

    def _scan_dir(self, d: str) -> List[Dict[str, str]]:
        out = []
        if not os.path.isdir(d):
            return out
        for name in sorted(os.listdir(d)):
            e1 = os.path.join(d, name, "events1.npz")
            e2 = os.path.join(d, name, "events2.npz")
            fl = os.path.join(d, name, "flow.flo")
            if os.path.exists(e1) and os.path.exists(e2) and os.path.exists(fl):
                out.append({"names": name, "event0": e1, "event1": e2, "fflow": fl})
        return out

    def _scan(self) -> None:
        if self.type == "train":
            self.data_ls = self._scan_dir(os.path.join(self.root, "train", self.dt))
        else:
            test_dir = os.path.join(self.root, "test", self.dt)
            self.nori_list = {}
            if os.path.isdir(test_dir):
                for seq in sorted(os.listdir(test_dir)):
                    self.nori_list[seq] = self._scan_dir(os.path.join(test_dir, seq))
            self.data_ls = next(iter(self.nori_list.values()), [])

    def change_test_sequence(self, sequence: str) -> None:
        self.data_ls = self.nori_list[sequence]

    def __len__(self) -> int:
        return len(self.data_ls)

    def _voxelize(self, path: str) -> np.ndarray:
        events = read_compressed_events(path)
        seq = EventSequence(
            events,
            height=self.image_height,
            width=self.image_width,
            timestamp_multiplier=1e6,
            convert_to_relative=True,
        )
        grid = events_to_voxel_grid_np(
            seq.features, self.num_bins, self.image_height, self.image_width
        )
        return grid.transpose(1, 2, 0)  # [H, W, bins]

    def _raw(self, path: str):
        """Read + pad raw events for device-side voxelization (fused C++
        decode+pack when available — ``eemflow_tpu.native``).  Columns are
        decompressed ONCE: NpzFile members are not cached, so a separate
        ``len(npz['t'])`` for the bucket ladder would decode the int64 t
        column (~60% of the record's bytes) twice on the host-bottleneck
        path."""
        from eemflow_tpu.native import decode_pack_arrays

        with np.load(path) as npz:
            t = np.ascontiguousarray(npz["t"], np.int64)
            x = np.ascontiguousarray(npz["x"], np.int16)
            y = np.ascontiguousarray(npz["y"], np.int16)
            p = np.ascontiguousarray(npz["p"], np.int8)
        bucket = choose_bucket(len(t), self.bucket_ladder)
        padded, n, dropped = decode_pack_arrays(
            t, x, y, p, bucket, out=self._pack_pool.get(bucket)
        )
        self.overflow.update(n + dropped, dropped)
        return padded, np.int32(n)

    def get_sample(self, idx: int) -> Dict[str, np.ndarray]:
        rec = self.data_ls[idx]
        fflow = read_flo(rec["fflow"])  # [H, W, 2]
        if self.full_res_flow and self.type == "train":
            flow = fflow  # dense label — skip the O(H·W) mesh propagation
        else:
            x_mesh, y_mesh = motion_propagate(fflow, mesh_size=self.mesh_size)
            flow = np.stack([x_mesh, y_mesh], axis=-1).astype(np.float32)

        sample = {
            "names": rec["names"],
            "flow": flow,  # [mesh, mesh, 2] (or dense [H, W, 2])
        }
        if self.type != "train":
            # full-res dense GT for research/eval modes only: in training it
            # would ship unused to the device and go stale (unflipped) after
            # augmentation
            sample["fflow"] = fflow
        if self.raw_events:
            sample["events_old"], sample["n_old"] = self._raw(rec["event0"])
            sample["events_new"], sample["n_new"] = self._raw(rec["event1"])
        else:
            ev_old = self._voxelize(rec["event0"])
            sample["event_volume_old"] = ev_old
            sample["event_volume_new"] = self._voxelize(rec["event1"])
            sample["event_valid"] = ev_old.sum(axis=-1, keepdims=True)  # [H, W, 1]
        return sample

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        sample = self.get_sample(idx % len(self))
        if self.type == "train" and self.raw_events:
            # flips drawn on host (label transformed here), grids flipped on
            # device inside the jitted step (data.device_input)
            flow = sample["flow"]
            if self.augmentor is not None:
                flow, fh, fv = self.augmentor.draw_flips(flow)
            else:
                fh = fv = False
            sample["flow"] = flow
            sample["flip_h"] = np.bool_(fh)
            sample["flip_v"] = np.bool_(fv)
            sample["valid"] = np.ones(flow.shape[:2], np.float32)
        elif self.type == "train":
            ev1, ev2, flow = sample["event_volume_old"], sample["event_volume_new"], sample["flow"]
            if self.augmentor is not None:
                ev1, ev2, flow = self.augmentor(ev1, ev2, flow, without_resize=True)
            sample["event_volume_old"] = ev1
            sample["event_volume_new"] = ev2
            sample["flow"] = flow
            sample["valid"] = np.ones(flow.shape[:2], np.float32)
        else:
            flow_full = _bilinear_upsample_np(
                sample["flow"], (self.image_height, self.image_width)
            )
            sample["flow"] = flow_full
            valid = (
                np.isfinite(flow_full).all(-1)
                & (np.linalg.norm(flow_full, axis=-1) > 0)
            )
            sample["valid"] = valid.astype(np.float32)
        return sample
