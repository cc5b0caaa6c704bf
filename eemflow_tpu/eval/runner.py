"""Evaluation engine (reference ``test_mvsec.py`` class ``Test`` +
``test_multi_sequence:538-671``).

Per-sequence loop over a dataset with ``change_test_sequence``; one
jit-compiled forward serves every sample (static shapes); per-sample EPE
accumulates host-side; results: per-sequence AEE + mean of sequence means
(``test_mvsec.py:659-671``), optional per-sample CSV
(``save_excel``, ``test_mvsec.py:410-432``).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from eemflow_tpu.eval.metrics import flow_error

# sample keys a forward pass may consume (family inputs + raw-event mode)
_INPUT_KEYS = (
    "event_volume_old", "event_volume_new", "event_volume", "image1",
    "event_raw", "d_event_volume_old", "d_event_volume_new",
    "events_old", "events_new", "n_old", "n_new",
)


class Tester:
    """Evaluation engine.  ``family`` selects the model's input contract
    (reference tester subclasses ``TestRaftEvents``/``TestSteRaft``/
    ``TestDCEI``/..., see ``train.adapters``); ``preprocess`` (if given)
    runs inside the jitted forward — the device-side voxelization path."""

    def __init__(
        self,
        model,
        variables,
        logger=None,
        save_path: Optional[str] = None,
        save_csv: bool = False,
        is_car: bool = False,
        family="two_volume",
        preprocess=None,
        mixed_precision: bool = False,
        mesh=None,
    ):
        from eemflow_tpu.train.adapters import get_family
        from eemflow_tpu.train.trainer import cast_floating

        self.model = model
        self._mesh = mesh
        if mesh is not None:
            # sharded eval: replicate params across the mesh once; batched
            # inputs are placed batch-sharded in _dispatch_many and XLA
            # SPMD-partitions the forward (exceeds the reference, whose
            # eval is single-GPU even under DataParallel training —
            # test_EEMFlow_HREM.py:63-66 unwraps to one device)
            from eemflow_tpu.parallel.mesh import replicated_sharding

            variables = jax.device_put(variables, replicated_sharding(mesh))
        self.variables = variables
        self.logger = logger
        self.save_path = save_path
        self.save_csv = save_csv
        self.is_car = is_car
        fam = get_family(family)
        self.family = fam
        self._preprocess = preprocess
        self._mixed_precision = mixed_precision

        def fwd(v, batch):
            if preprocess is not None:
                batch = preprocess(batch)
            args = fam.model_args(batch)
            if mixed_precision:
                v = cast_floating(v, jnp.bfloat16)
                args = cast_floating(args, jnp.bfloat16)
            out = fam.flow_est(self.model.apply(v, *args))
            return out.astype(jnp.float32)

        self._fwd = jax.jit(fwd)

    def _log(self, line: str) -> None:
        if self.logger is not None:
            self.logger.write_line(line, verbose=True)
        else:
            print(line, flush=True)

    @staticmethod
    def _make_batch(sample) -> Dict[str, jnp.ndarray]:
        """Sample dict → single-sample batch of the family input keys."""
        return {
            k: jnp.asarray(sample[k])[None]
            for k in _INPUT_KEYS
            if k in sample and sample[k] is not None
        }

    def run_sample(self, sample: Dict[str, np.ndarray]) -> np.ndarray:
        """Single sample dict → flow [H, W, 2] (adds the batch dim)."""
        return np.asarray(self._dispatch(sample))[0]

    def run_network(self, ev1: np.ndarray, ev2: np.ndarray) -> np.ndarray:
        """ev1/ev2: [H, W, C] single sample → flow [H, W, 2]
        (two-volume convenience wrapper)."""
        return self.run_sample(
            {"event_volume_old": ev1, "event_volume_new": ev2}
        )

    def _dispatch(self, sample):
        """Async-dispatch the forward for one sample (no result fetch)."""
        return self._fwd(self.variables, self._make_batch(sample))

    def _dispatch_many(self, samples):
        """Async-dispatch ONE batched forward over several samples.

        Protocol-identical to per-sample dispatch: eval-mode normalization
        uses running statistics (never cross-batch stats) and every other
        op is per-sample, so stacking only changes throughput — one
        program amortizes per-dispatch overhead and batches the device
        work (marginal per-frame cost: ``batched_throughput_fps`` in
        BENCH_r03; docs/PERF.md round-3 CSE postmortem corrected the
        round-2 multiplier quoted here).  Metrics stay per-sample."""
        from eemflow_tpu.data.loader import collate

        batch = collate(samples)
        batch = {
            k: v for k, v in batch.items()
            if k in _INPUT_KEYS and v is not None
        }
        if (self._mesh is not None
                and len(samples) % self._mesh.shape["data"] == 0):
            # place each host shard directly on its device (a jnp.asarray
            # first would commit to device 0 and then redistribute)
            from eemflow_tpu.parallel.mesh import batch_sharding

            shard = batch_sharding(self._mesh)
            batch = {k: jax.device_put(np.asarray(v), shard)
                     for k, v in batch.items()}
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return self._fwd(self.variables, batch)

    def test_sequence(
        self, dataset, stride: int = 1, max_samples: Optional[int] = None,
        batch_size: int = 1,
    ) -> Dict[str, float]:
        """Evaluate the dataset's current sequence; returns aggregates.

        Depth-1 pipelined: batch i+1's forward is dispatched before batch
        i's flows are fetched, so host work (dataset IO + numpy metrics)
        overlaps device compute — protocol-identical results.
        ``batch_size > 1`` stacks samples into one fused forward (the
        batched-eval throughput path; results identical per sample)."""
        AEE_sum = 0.0
        pct1_sum = 0.0
        pct3_sum = 0.0
        iters = 0
        rows = []
        pending = None  # (sample, device flow future)
        indices = [i for i in range(len(dataset)) if not (i % stride)]
        if max_samples is not None:
            indices = indices[:max_samples]

        def consume(samples, fut):
            nonlocal AEE_sum, pct1_sum, pct3_sum, iters
            flows = np.asarray(fut)
            for j, sample in enumerate(samples):
                ev_img = np.asarray(sample.get("event_valid"))
                ev_img = np.squeeze(ev_img) if ev_img is not None else None
                aee, p1, p3, n, _, _, _ = flow_error(
                    np.asarray(sample["flow"]),
                    flows[j],
                    event_img=ev_img,
                    is_car=self.is_car,
                    evaluation_type=getattr(dataset, "evaluation_type", "dense"),
                )
                AEE_sum += aee
                pct1_sum += p1
                pct3_sum += p3
                iters += 1
                rows.append([iters, aee])

        for c0 in range(0, len(indices), batch_size):
            samples = [dataset[i] for i in indices[c0 : c0 + batch_size]]
            fut = (
                self._dispatch(samples[0]) if len(samples) == 1
                else self._dispatch_many(samples)
            )
            if pending is not None:
                consume(*pending)
            pending = (samples, fut)
        if pending is not None:
            consume(*pending)
        if self.save_csv and self.save_path is not None:
            os.makedirs(self.save_path, exist_ok=True)
            with open(
                os.path.join(self.save_path, "test_epe_per_sample.csv"), "w", newline=""
            ) as f:
                w = csv.writer(f)
                w.writerow(["index", "epe"])
                w.writerows(rows)
        n = max(iters, 1)
        return {
            "AEE": AEE_sum / n,
            "pct1_outlier": 1.0 - pct1_sum / n,
            "pct3_outlier": 1.0 - pct3_sum / n,
            "n_samples": iters,
        }

    def validate_chairs(self, dataset,
                        max_samples: Optional[int] = None) -> float:
        """FlyingChairs validation (reference ``test_mvsec.py:1341-1393``):
        unmasked per-pixel EPE, mean over ALL pixels of the split (the
        concatenated-EPE protocol, not per-sample averaging).  The GRU
        iteration count is a model-constructor field here (``get_model(...,
        iters=N)``), not a per-call argument."""
        epe_sum = 0.0
        n_px = 0
        done = 0
        for idx in range(len(dataset)):
            sample = dataset[idx]
            flow_est = self.run_sample(sample)
            gt = np.asarray(sample["flow"])
            epe = np.sqrt(((flow_est - gt) ** 2).sum(-1))
            epe_sum += float(epe.sum())
            n_px += epe.size
            done += 1
            if max_samples is not None and done >= max_samples:
                break
        epe = epe_sum / max(n_px, 1)
        self._log(f"Validation Chairs EPE: {epe:f}")
        return epe

    def test_multi_sequence(
        self,
        dataset,
        sequence_list: Sequence[str],
        stride: int = 1,
        max_samples: Optional[int] = None,
        batch_size: int = 1,
    ) -> Dict[str, Dict[str, float]]:
        """Per-sequence eval + mean of per-sequence AEE (the HREM protocol)."""
        results: Dict[str, Dict[str, float]] = {}
        for seq in sequence_list:
            dataset.change_test_sequence(seq)
            t0 = time.time()
            res = self.test_sequence(dataset, stride=stride,
                                     max_samples=max_samples,
                                     batch_size=batch_size)
            self._log(
                f"[{seq}] AEE {res['AEE']:.6f}  1px-out {res['pct1_outlier']:.6f}  "
                f"3px-out {res['pct3_outlier']:.6f}  ({res['n_samples']} samples, "
                f"{time.time() - t0:.1f}s)"
            )
            results[seq] = res
        mean_aee = float(np.mean([r["AEE"] for r in results.values()]))
        self._log(f"mean AEE over sequences: {mean_aee:.6f}")
        results["mean"] = {"AEE": mean_aee}
        return results


class ResearchTester(Tester):
    """Research evaluation modes (reference ``test_mvsec.py``):
    flow dumps (:1008 test_multi_save_flow), low-EPE visualization
    (:442 test_vis_low_epe), warp inference (:673 inference_img — the
    reference's own helper module is missing from its repo; warping here
    uses the shared backwarp op), density-bucketed AEE (:1181
    test_multi_density)."""

    def test_multi_save_flow(self, dataset, out_dir: str, stride: int = 1,
                             max_samples: Optional[int] = None) -> int:
        """Save predicted flow per sample as .flo + colorwheel jpg."""
        from eemflow_tpu.events.io import write_flo
        from eemflow_tpu.viz.flow_viz import visualize_optical_flow

        os.makedirs(out_dir, exist_ok=True)
        n = 0
        for idx in range(len(dataset)):
            if idx % stride:
                continue
            sample = dataset[idx]
            flow_est = self.run_sample(sample)
            write_flo(flow_est, os.path.join(out_dir, f"{idx:06d}.flo"))
            try:
                import cv2

                cv2.imwrite(
                    os.path.join(out_dir, f"{idx:06d}_flow.jpg"),
                    visualize_optical_flow(flow_est),
                )
            except ImportError:
                pass
            n += 1
            if max_samples is not None and n >= max_samples:
                break
        self._log(f"saved {n} flow predictions to {out_dir}")
        return n

    def test_vis_low_epe(self, dataset, out_dir: str, epe_threshold: float = 1.0,
                         stride: int = 1, max_samples: Optional[int] = None):
        """Dump visualizations for samples whose AEE is below threshold."""
        from eemflow_tpu.viz.flow_viz import visualize_optical_flow

        os.makedirs(out_dir, exist_ok=True)
        kept = []
        for idx in range(len(dataset)):
            if idx % stride:
                continue
            sample = dataset[idx]
            flow_est = self.run_sample(sample)
            aee, *_ = flow_error(
                np.asarray(sample["flow"]), flow_est,
                event_img=np.squeeze(np.asarray(sample.get("event_valid")))
                if sample.get("event_valid") is not None else None,
                is_car=self.is_car,
                evaluation_type=getattr(dataset, "evaluation_type", "dense"),
            )
            if aee < epe_threshold:
                kept.append((idx, aee))
                try:
                    import cv2

                    cv2.imwrite(
                        os.path.join(out_dir, f"{idx:06d}_est_epe{aee:.3f}.jpg"),
                        visualize_optical_flow(flow_est),
                    )
                    cv2.imwrite(
                        os.path.join(out_dir, f"{idx:06d}_gt.jpg"),
                        visualize_optical_flow(np.asarray(sample["flow"])),
                    )
                except ImportError:
                    pass
            if max_samples is not None and len(kept) >= max_samples:
                break
        self._log(f"{len(kept)} samples below EPE {epe_threshold}")
        return kept

    def inference_warp(self, dataset, out_dir: str, stride: int = 1,
                       max_samples: Optional[int] = None) -> int:
        """Warp the second event image back by the predicted flow and save
        (event1, warped-event2) frame pairs — the reference's warp-GIF mode."""
        import jax.numpy as jnp

        from eemflow_tpu.ops.warp import backwarp

        os.makedirs(out_dir, exist_ok=True)
        n = 0
        for idx in range(len(dataset)):
            if idx % stride:
                continue
            sample = dataset[idx]
            flow_est = self.run_sample(sample)
            ev2 = np.asarray(sample["event_volume_new"]).sum(-1, keepdims=True)
            warped = np.asarray(
                backwarp(jnp.asarray(ev2)[None], jnp.asarray(flow_est)[None])
            )[0]

            def to_img(a):
                a = np.squeeze(a)
                rng = a.max() - a.min()
                return ((a - a.min()) / (rng + 1e-8) * 255).astype(np.uint8)

            try:
                import cv2

                ev1 = np.asarray(sample["event_volume_old"]).sum(-1)
                cv2.imwrite(os.path.join(out_dir, f"{idx:06d}_ev1.jpg"), to_img(ev1))
                cv2.imwrite(
                    os.path.join(out_dir, f"{idx:06d}_ev2_warped.jpg"), to_img(warped)
                )
            except ImportError:
                pass
            n += 1
            if max_samples is not None and n >= max_samples:
                break
        return n

    def test_multi_density(self, dataset, buckets=(0.0, 0.05, 0.15, 0.3, 1.01),
                           stride: int = 1, max_samples: Optional[int] = None):
        """AEE grouped by event-density buckets (fraction of active pixels)."""
        sums = [0.0] * (len(buckets) - 1)
        counts = [0] * (len(buckets) - 1)
        done = 0
        for idx in range(len(dataset)):
            if idx % stride:
                continue
            sample = dataset[idx]
            ev = np.asarray(sample["event_volume_old"])
            density = float((np.abs(ev).sum(-1) > 0).mean())
            flow_est = self.run_sample(sample)
            aee, *_ = flow_error(
                np.asarray(sample["flow"]), flow_est,
                event_img=np.squeeze(np.asarray(sample.get("event_valid")))
                if sample.get("event_valid") is not None else None,
                is_car=self.is_car,
                evaluation_type=getattr(dataset, "evaluation_type", "dense"),
            )
            for b in range(len(buckets) - 1):
                if buckets[b] <= density < buckets[b + 1]:
                    sums[b] += aee
                    counts[b] += 1
            done += 1
            if max_samples is not None and done >= max_samples:
                break
        result = {
            f"[{buckets[b]:.2f},{buckets[b + 1]:.2f})":
                (sums[b] / counts[b] if counts[b] else float("nan"), counts[b])
            for b in range(len(buckets) - 1)
        }
        for k, (aee, cnt) in result.items():
            self._log(f"density {k}: AEE {aee:.4f} ({cnt} samples)")
        return result

    def save_dsec_submission(self, dataset, out_dir: str, stride: int = 1,
                             max_samples: Optional[int] = None) -> int:
        """Write 16-bit PNG flow submission files (reference
        DsecFlowVisualizer.visualize_flow_submission,
        ``utils/visualization.py:76``)."""
        from eemflow_tpu.data.dsec import write_flow_submission

        os.makedirs(out_dir, exist_ok=True)
        n = 0
        for idx in range(len(dataset)):
            if idx % stride:
                continue
            sample = dataset[idx]
            flow_est = self.run_sample(sample)
            name = sample.get("names", f"{idx:06d}")
            write_flow_submission(flow_est, os.path.join(out_dir, f"{name}.png"))
            n += 1
            if max_samples is not None and n >= max_samples:
                break
        self._log(f"wrote {n} DSEC submission files to {out_dir}")
        return n

    def inference_warp_loss(self, dataset, stride: int = 10,
                            max_samples: Optional[int] = None) -> float:
        """Probe-point flow error (reference ``inference_img_warp_loss``,
        ``test_mvsec.py:753-851``): per sample, the mean L2 difference
        between GT and estimated flow at the 16 centers of a 4×4 grid of
        image cells ("FWL" in the reference log); returns the sequence mean."""
        loss_sum = 0.0
        iters = 0
        for idx in range(len(dataset)):
            if idx % stride:
                continue
            sample = dataset[idx]
            flow_est = self.run_sample(sample)
            flow_gt = np.asarray(sample["flow"])
            h, w = flow_gt.shape[:2]
            ys = (np.arange(4) + 0.5) * (h // 4)
            xs = (np.arange(4) + 0.5) * (w // 4)
            yy, xx = np.meshgrid(ys.astype(int), xs.astype(int), indexing="ij")
            diff = flow_gt[yy.ravel(), xx.ravel()] - flow_est[yy.ravel(), xx.ravel()]
            fwl = float(np.mean(np.linalg.norm(diff, axis=-1)))
            loss_sum += fwl
            iters += 1
            if max_samples is not None and iters >= max_samples:
                break
        mean_fwl = loss_sum / max(iters, 1)
        self._log(f"Mean FWL: {mean_fwl:.6f} ({iters} samples)")
        return mean_fwl

    def test_multi_key(self, dataset, stride: int = 1,
                       max_samples: Optional[int] = None):
        """Key-map density study (reference ``test_multi_key``,
        ``test_mvsec.py:854-1005``): for enhancement-frontend models whose
        ``maps`` output carries per-view key/enhanced volumes, log per
        sample the input event density, the enhanced-map density and the
        AEE; writes ``key_density.csv`` (the reference writes xlsx) and
        returns (mean AEE, rows)."""
        def density(a):
            return float((np.abs(np.asarray(a)).sum(-1) > 0).mean())

        from eemflow_tpu.train.trainer import cast_floating

        fam = self.family
        model = self.model

        def fwd_with_maps(v, batch):
            # mirror the __init__ fwd closure: device-voxelize preprocess and
            # bf16 cast must apply here too, or raw-events mode feeds padded
            # event buffers straight to the model
            if self._preprocess is not None:
                batch = self._preprocess(batch)
            args = fam.model_args(batch)
            if self._mixed_precision:
                v = cast_floating(v, jnp.bfloat16)
                args = cast_floating(args, jnp.bfloat16)
            maps, flows = model.apply(v, *args)
            # also return the (possibly device-voxelized) input volume so the
            # density column works in raw-events mode
            return batch.get("event_volume_old"), maps, fam.flow_est((maps, flows))

        fwd = jax.jit(fwd_with_maps)
        rows = []
        AEE_sum = 0.0
        iters = 0
        for idx in range(len(dataset)):
            if idx % stride:
                continue
            sample = dataset[idx]
            vol_old, maps, flow = fwd(self.variables, self._make_batch(sample))
            flow_est = np.asarray(flow)[0]
            aee, *_ = flow_error(
                np.asarray(sample["flow"]), flow_est,
                event_img=np.squeeze(np.asarray(sample.get("event_valid")))
                if sample.get("event_valid") is not None else None,
                is_car=self.is_car,
                evaluation_type=getattr(dataset, "evaluation_type", "dense"),
            )
            # finest enhanced/key map, view 1 (maps is either a (m1, m2)
            # pair or a multi-scale list of pairs, finest last)
            key_map = maps
            if (isinstance(key_map, (list, tuple)) and key_map
                    and isinstance(key_map[-1], (list, tuple))):
                key_map = key_map[-1]  # multi-scale list of pairs → finest
            if isinstance(key_map, (list, tuple)):
                key_map = key_map[0]  # (view1, view2) → view 1
            map_den = density(key_map)
            ev_src = (vol_old if vol_old is not None
                      else sample["event_volume_old"])
            ev_den = density(ev_src)
            row = [f"{idx}", ev_den, map_den, f"{aee:.3f}"]
            if sample.get("d_event_volume_old") is not None:
                row.insert(2, density(sample["d_event_volume_old"]))
            rows.append(row)
            AEE_sum += aee
            iters += 1
            if max_samples is not None and iters >= max_samples:
                break
        if self.save_path is not None and rows:
            os.makedirs(self.save_path, exist_ok=True)
            with open(os.path.join(self.save_path, "key_density.csv"),
                      "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["name", "input", "unet_out", "AEE"]
                           if len(rows[0]) == 4 else
                           ["name", "input", "dense_event", "unet_out", "AEE"])
                w.writerows(rows)
        mean_aee = AEE_sum / max(iters, 1)
        self._log(f"test_multi_key: mean AEE {mean_aee:.6f} ({iters} samples)")
        return mean_aee, rows
