"""MVSEC dataset (346×260 event flow, reference ``loader/MVSEC.py``).

Per-frame event tables (pandas-HDF5, produced by the offline encoder) + GT
flow ``.npy`` synthesized by time propagation.  Protocols:

  * dt1 — events between consecutive frames (``MvsecEventFlow``),
  * dt4 — events concatenated over 4 frame intervals
    (``MvsecEventFlow_dt4``, reference ``MVSEC.py:197-285``),
  * dense/sparse evaluation (``eval_type``) — sparse additionally masks to
    pixels with ≥1 event (mask = 2D histogram of event coords,
    ``MVSEC.py:132-142``),
  * val center-crops everything to 256×256 (``MVSEC.py:189-193``).

Valid frame ranges per sequence are the reference's hard-coded table
(``MVSEC.py:24-31``).  File naming: flow ``{i}.npy``, events
``{i+1:06d}.h5`` (``MVSEC.py:86-90``).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from eemflow_tpu.data.augment import DenseSparseAugmentor, FlowAugmentor
from eemflow_tpu.events.io import read_events_h5
from eemflow_tpu.events.sequence import EventSequence
from eemflow_tpu.events.voxel import (
    choose_bucket,
    events_to_voxel_grid_np,
    make_ladder,
)

VALID_TIME_INDEX = {
    "indoor_flying1": [(314, 2199)],
    "indoor_flying2": [(314, 2199)],
    "indoor_flying3": [(314, 2199)],
    "indoor_flying4": [(196, 570)],
    "outdoor_day1": [(245, 3000)],
    "outdoor_day2": [(4375, 7002)],
}


def center_crop(arr: np.ndarray, size: int = 256) -> np.ndarray:
    """torchvision CenterCrop semantics on [H, W, ...]."""
    h, w = arr.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return arr[top : top + size, left : left + size]


class MvsecEventFlow:
    image_width = 346
    image_height = 260
    dt_intervals = 1

    def __init__(
        self,
        root: str,
        sequence: str,
        train: bool = True,
        num_bins: int = 5,
        eval_type: str = "dense",
        aug_params: Optional[dict] = None,
        flowgt_dirname: str = "flowgt_dt1",
        rng: Optional[np.random.Generator] = None,
        raw_events: bool = False,
        bucket_size: int = 1 << 17,
        with_dense: bool = False,
        time_stack: bool = False,
        bucket_rungs: int = 1,
        time_stack_channels: int = 0,
        with_images: bool = False,
        seg_events: bool = False,
        seg_bucket: int = 1 << 15,
    ):
        # with_dense: also emit d_event_volume_old/new (the reference MVSEC
        # loader mirrors the volumes, MVSEC.py:129-130; the dense/sparse
        # unite trainers consume them), augmented jointly.
        # time_stack: emit 'event_volume' [H, W, C, T] with one voxel grid
        # per frame interval — the STE/spike single-volume contract
        # (reference TrainSteRaft; its own loader is absent from the
        # reference snapshot, SURVEY §2.12).
        # time_stack_channels: 0 = num_bins voxel grids per interval;
        # 2/4 = count-based grids matching the spiking nets' fixed input
        # widths (STE-FlowNet conv1 reads 2 channels, spiking FlowNetS 4 —
        # STEmodel/STEFlow.py:73 / spikemodel/FlowNetS_spike.py:36):
        # C=2 → [on count, off count] per interval; C=4 → on/off × the
        # former/latter half of the interval (the spike-camera input
        # convention those encoders were built for).
        # with_images: emit 'image1' (<seq>/image/{frame+1:06d}.png, float32
        # 0..255) + 'event_volume' = concat(old, new) [H, W, 2·bins] — the
        # DCEIFlow event+image contract (reference TestDCEI.run_network,
        # test_mvsec.py:1908-1916; its loader is absent upstream).
        # seg_events: emit 'event_raw' [2, seg_bucket, 4] (x, y, ts, p) raw
        # segments (old window, new window) for the point-transformer
        # models (reference TrainRaftSegEvents, train_mvsec.py:389-413; its
        # loader is absent upstream).  Windows with more events are
        # evenly-strided subsampled to the bucket, fewer are wrap-repeated
        # — every row stays a REAL event (zero-padding would inject fake
        # points into the FPS attention).
        self.with_dense = with_dense
        self.time_stack = time_stack
        self.time_stack_channels = time_stack_channels
        self.with_images = with_images
        self.seg_events = seg_events
        self.seg_bucket = seg_bucket
        self.root = root
        self.type = "train" if train else "val"
        self.num_bins = num_bins
        self.evaluation_type = eval_type
        self.flowgt_dirname = flowgt_dirname
        # raw-events mode: device-side voxelization (data.device_input).
        # Train raw mode applies flips only — the scale/stretch resize
        # branch needs host cv2 and stays on the host path.
        self.raw_events = raw_events
        self.bucket_size = bucket_size
        # bucket ladder (events.voxel.make_ladder): per-sample pad to the
        # smallest rung that fits; bounded step recompiles, less scatter
        self.bucket_ladder = (
            make_ladder(bucket_size, bucket_rungs) if bucket_rungs > 1
            else (bucket_size,)
        )
        if raw_events:
            from eemflow_tpu.data.device_input import EventOverflowCounter

            self.overflow = EventOverflowCounter("MVSEC")
        if aug_params is not None:
            self.augmentor = FlowAugmentor(**aug_params, rng=rng)
            self.dense_augmentor = DenseSparseAugmentor(**aug_params, rng=rng)
        else:
            self.augmentor = None
            self.dense_augmentor = None
        self.change_test_sequence(sequence)

    def change_test_sequence(self, sequence: str) -> None:
        self.names = []
        for s in VALID_TIME_INDEX[sequence]:
            self.names.extend(range(s[0], s[1]))
        self.sequence = sequence
        seq_dir = os.path.join(self.root, sequence)
        self.flowgt_path = os.path.join(seq_dir, self.flowgt_dirname)
        self.event_path = os.path.join(seq_dir, "event")
        self.flow_list = [
            os.path.join(self.flowgt_path, f"{i}.npy") for i in self.names
        ]
        self.event_list = [
            os.path.join(self.event_path, f"{i + 1:06d}.h5") for i in self.names
        ]
        # trailing event files for the final windows: sample idx reads
        # old = event_list[idx : idx+k] and new = event_list[idx+k : idx+2k],
        # so the last sample (idx = M-1) needs indices up to M-1 + 2k-1 —
        # i.e. 2k-1 files beyond the M-th (k=1 → 1, matching dt1)
        last = self.names[-1] if self.names else 0
        extra = 2 * self.dt_intervals - 1
        for j in range(extra):
            self.event_list.append(
                os.path.join(self.event_path, f"{last + 2 + j:06d}.h5")
            )

    def __len__(self) -> int:
        return len(self.names)

    def _event_sequence(self, paths) -> EventSequence:
        return self._sequence_from_arrays([read_events_h5(p) for p in paths])

    def _sequence_from_arrays(self, arrays) -> EventSequence:
        events = np.concatenate(arrays, axis=0) if len(arrays) > 1 else arrays[0]
        return EventSequence(
            events,
            height=self.image_height,
            width=self.image_width,
            timestamp_multiplier=1e6,
            convert_to_relative=True,
        )

    def _voxelize(self, seq: EventSequence) -> np.ndarray:
        grid = events_to_voxel_grid_np(
            seq.features, self.num_bins, self.image_height, self.image_width
        )
        return grid.transpose(1, 2, 0)

    def _count_grid(self, seq: EventSequence, channels: int) -> np.ndarray:
        """[H, W, channels] polarity-count grid for one interval (the
        spiking nets' fixed-width input; see __init__ notes)."""
        ev = seq.features  # [N, 4] = [ts, x, y, p]
        H, W = self.image_height, self.image_width
        out = np.zeros((H, W, channels), np.float32)
        if len(ev) == 0:
            return out
        xs = np.clip(ev[:, 1].astype(np.int64), 0, W - 1)
        ys = np.clip(ev[:, 2].astype(np.int64), 0, H - 1)
        on = ev[:, 3] > 0
        if channels == 2:
            groups = [on, ~on]
        else:  # 4: on/off × former/latter half of the interval
            t_mid = 0.5 * (ev[0, 0] + ev[-1, 0])
            former = ev[:, 0] <= t_mid
            groups = [on & former, (~on) & former,
                      on & (~former), (~on) & (~former)]
        for c, g in enumerate(groups):
            np.add.at(out[:, :, c], (ys[g], xs[g]), 1.0)
        return out

    def _segment(self, seq: EventSequence) -> np.ndarray:
        """[seg_bucket, 4] (x, y, ts, p) fixed-size segment of real events
        (strided subsample / wrap-repeat; see __init__ notes)."""
        ev = seq.features  # [ts, x, y, p]
        N = self.seg_bucket
        n = len(ev)
        if n == 0:
            return np.zeros((N, 4), np.float32)
        if n >= N:
            idx = np.linspace(0, n - 1, N).astype(np.int64)
        else:
            idx = np.arange(N) % n
        sel = ev[idx]
        out = np.empty((N, 4), np.float32)
        out[:, 0] = sel[:, 1]  # x
        out[:, 1] = sel[:, 2]  # y
        out[:, 2] = sel[:, 0]  # ts (relative seconds)
        out[:, 3] = np.where(sel[:, 3] == 0, -1.0, sel[:, 3])  # p ±1
        return out

    def _read_image(self, idx: int) -> np.ndarray:
        """image for sample idx: <seq>/image/{frame+1:06d}.png → [H, W, 3]
        float32 in [0, 255] (file numbering matches the event tables)."""
        import cv2

        path = os.path.join(
            os.path.join(self.root, self.sequence), "image",
            f"{self.names[idx] + 1:06d}.png",
        )
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(path)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        elif img.shape[-1] == 4:
            img = img[..., :3]
        return img[..., ::-1].astype(np.float32)  # BGR → RGB

    def _event_mask(self, seq: EventSequence) -> np.ndarray:
        ev = seq.features
        hist, _, _ = np.histogram2d(
            x=ev[:, 1],
            y=ev[:, 2],
            bins=(self.image_width, self.image_height),
            range=[[0, self.image_width], [0, self.image_height]],
        )
        return (hist.T > 0)[..., None].astype(np.float32)  # [H, W, 1]

    def get_sample(self, idx: int) -> Dict[str, np.ndarray]:
        flow = np.load(self.flow_list[idx])
        if flow.shape[0] == 2 and flow.ndim == 3:
            flow = flow.transpose(1, 2, 0)
        flow = flow.astype(np.float32)

        k = self.dt_intervals
        # direct indexing — change_test_sequence appends 2k-1 trailing files,
        # so no wrap-around is needed (a modulo here would silently pull
        # events from the start of the recording into the last samples)
        old_paths = self.event_list[idx : idx + k]
        new_paths = self.event_list[idx + k : idx + 2 * k]

        old_arrays = [read_events_h5(p) for p in old_paths]
        seq_old = self._sequence_from_arrays(old_arrays)
        seq_new = self._event_sequence(new_paths)

        sample = {"idx": self.names[idx], "flow": flow}
        if self.raw_events:
            from eemflow_tpu.events.voxel import pad_events

            for key, seq in (("old", seq_old), ("new", seq_new)):
                # EventSequence already scaled/sorted → plain pad (the fused
                # native decode covers the HREM npz path; MVSEC's pandas-h5
                # read dominates here anyway)
                bucket = choose_bucket(len(seq.features), self.bucket_ladder)
                padded, n, dropped = pad_events(seq.features, bucket)
                self.overflow.update(len(seq.features), dropped)
                sample[f"events_{key}"] = padded
                sample[f"n_{key}"] = np.int32(n)
        else:
            sample["event_volume_old"] = self._voxelize(seq_old)
            sample["event_volume_new"] = self._voxelize(seq_new)
            if self.with_dense:
                # reference MVSEC.py:129-130 mirrors the volumes
                sample["d_event_volume_old"] = sample["event_volume_old"].copy()
                sample["d_event_volume_new"] = sample["event_volume_new"].copy()
            if self.time_stack:
                # one grid per frame interval, trailing time axis — reuse
                # the arrays already parsed for seq_old (pandas-h5 reads
                # dominate host cost; no second parse)
                C = self.time_stack_channels
                grids = [
                    (self._count_grid(self._sequence_from_arrays([a]), C)
                     if C in (2, 4)
                     else self._voxelize(self._sequence_from_arrays([a])))
                    for a in old_arrays
                ]
                sample["event_volume"] = np.stack(grids, axis=-1)
            if self.with_images:
                # DCEIFlow contract: 2·bins event window + frame image
                sample["event_volume"] = np.concatenate(
                    [sample["event_volume_old"],
                     sample["event_volume_new"]], axis=-1
                )
                sample["image1"] = self._read_image(idx)
            if self.seg_events:
                sample["event_raw"] = np.stack(
                    [self._segment(seq_old), self._segment(seq_new)]
                )
        if self.type == "val":
            sample["event_valid"] = self._event_mask(seq_old)
        return sample

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        sample = self.get_sample(idx % len(self))
        if self.type == "train" and self.raw_events:
            flow = sample["flow"]
            if self.augmentor is not None:
                flow, fh, fv = self.augmentor.draw_flips(flow)
            else:
                fh = fv = False
            # random crop (device order: voxelize full-res → flip → crop,
            # so the label is flipped first, then cropped with the same
            # offsets make_device_preprocess applies to the grids)
            aug = self.augmentor
            if (aug is not None and aug.crop_size is not None
                    and tuple(aug.crop_size) != flow.shape[:2]):
                cy, cx = aug.draw_crop(flow.shape[0], flow.shape[1])
                ch, cw = aug.crop_size
                flow = flow[cy : cy + ch, cx : cx + cw]
                sample["crop_y"] = np.int32(cy)
                sample["crop_x"] = np.int32(cx)
            valid = np.isfinite(flow).all(-1) & (np.linalg.norm(flow, axis=-1) > 0)
            sample["flow"] = flow
            sample["valid"] = valid.astype(np.float32)
            sample["flip_h"] = np.bool_(fh)
            sample["flip_v"] = np.bool_(fv)
        elif self.type == "train":
            ev1, ev2, flow = (
                sample["event_volume_old"],
                sample["event_volume_new"],
                sample["flow"],
            )
            if self.with_dense and self.dense_augmentor is not None:
                # joint sparse+dense augmentation (reference MVSEC.py:161-173)
                ev1, ev2, d1, d2, flow = self.dense_augmentor(
                    ev1, ev2,
                    sample["d_event_volume_old"], sample["d_event_volume_new"],
                    flow,
                )
                sample["d_event_volume_old"] = d1
                sample["d_event_volume_new"] = d2
            elif self.augmentor is not None:
                if self.time_stack:
                    # fold the [H,W,C,T] stack into ev1's channels so the
                    # whole sample sees identical augmentation draws
                    vol = sample["event_volume"]
                    Hc, Wc, C, T = vol.shape
                    ev1 = np.concatenate(
                        [ev1, vol.reshape(Hc, Wc, C * T)], axis=-1
                    )
                    ev1, ev2, flow = self.augmentor(ev1, ev2, flow)
                    nb = self.num_bins
                    sample["event_volume"] = ev1[..., nb:].reshape(
                        ev1.shape[0], ev1.shape[1], C, T
                    )
                    ev1 = ev1[..., :nb]
                elif self.with_images:
                    # fold image1 into ev1's channels (spatial-only
                    # transforms, values preserved) so event volumes,
                    # image and flow see identical augmentation draws
                    ev1 = np.concatenate([ev1, sample["image1"]], axis=-1)
                    ev1, ev2, flow = self.augmentor(ev1, ev2, flow)
                    sample["image1"] = ev1[..., -3:]
                    ev1 = ev1[..., :-3]
                else:
                    ev1, ev2, flow = self.augmentor(ev1, ev2, flow)
                # seg_events train mode keeps the raw segments
                # unaugmented: the reference ships no seg-events loader
                # (SURVEY §2.12), so there is no augmentation convention
                # to match; per-event spatial transforms are left to the
                # caller if ever needed
            if self.with_images:
                # rebuild the DCEIFlow window concat from the (possibly
                # augmented) volumes
                sample["event_volume"] = np.concatenate([ev1, ev2], axis=-1)
            valid = np.isfinite(flow).all(-1) & (np.linalg.norm(flow, axis=-1) > 0)
            sample["event_volume_old"] = ev1
            sample["event_volume_new"] = ev2
            sample["flow"] = flow
            sample["valid"] = valid.astype(np.float32)
        else:
            sample["flow"] = center_crop(sample["flow"])
            sample["valid"] = (
                (np.abs(sample["flow"][..., 0]) < 1000)
                & (np.abs(sample["flow"][..., 1]) < 1000)
            ).astype(np.float32)
            if not self.raw_events:
                # raw mode: the device preprocess center-crops the grids
                # (make_device_preprocess(crop_size=(256, 256)))
                for k in ("event_volume_old", "event_volume_new",
                          "d_event_volume_old", "d_event_volume_new",
                          "event_volume", "image1"):
                    if k in sample:
                        sample[k] = center_crop(sample[k])
            if "event_raw" in sample:
                # shift raw coords into the center-crop frame; events
                # outside get coords < 0 so the scatter-back in-bounds
                # test drops their votes (event_transformer.py)
                seg = sample["event_raw"]
                top = (self.image_height - 256) // 2
                left = (self.image_width - 256) // 2
                seg[..., 0] -= left
                seg[..., 1] -= top
                oob = ((seg[..., 0] < 0) | (seg[..., 0] >= 256)
                       | (seg[..., 1] < 0) | (seg[..., 1] >= 256))
                seg[..., 0] = np.where(oob, -1.0, seg[..., 0])
                seg[..., 1] = np.where(oob, -1.0, seg[..., 1])
            sample["event_valid"] = center_crop(sample["event_valid"])
        return sample


class MvsecEventFlow_dt4(MvsecEventFlow):
    """dt4 protocol: 4 frame-intervals of events per window
    (reference ``MVSEC.py:197-285``)."""

    dt_intervals = 4

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("flowgt_dirname", "flowgt_dt4")
        super().__init__(*args, **kwargs)
