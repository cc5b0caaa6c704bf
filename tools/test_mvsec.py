"""MVSEC evaluation CLI (reference ``test_mvsec.py`` engine usage).

Evaluates dense or sparse protocol with the reference's exact masking
(is_car row-crop for outdoor sequences, event-presence mask for sparse,
center-crop 256 val frames), per-sample CSV, stride subsampling.

Usage:
  python tools/test_mvsec.py -model eemflow -int dt1 --sequence indoor_flying1 \
      --data_root dataset/MVSEC --checkpoint <ckpt> --eval_type dense --stride 30
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description="Evaluate on MVSEC")
    p.add_argument("-model", default="eemflow")
    p.add_argument("-int", dest="event_interval", default="dt1", choices=["dt1", "dt4"])
    p.add_argument("--sequence", default="indoor_flying1")
    p.add_argument("--data_root", default="dataset/MVSEC")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--eval_type", default="dense", choices=["dense", "sparse"])
    p.add_argument("--stride", type=int, default=30)
    p.add_argument("--save_dir", default="runs/mvsec_eval")
    p.add_argument("--save_csv", action="store_true")
    p.add_argument(
        "--mode", default="standard",
        choices=["standard", "save_flow", "low_epe", "warp", "density",
                 "dsec_submission", "warp_loss", "multi_key"],
        help="research evaluation modes (reference test_mvsec.py research "
        "methods; 'standard' = the protocol eval)",
    )
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--device_voxelize", action="store_true",
                   help="voxelize raw events on device (center-crop included)")
    p.add_argument("--bucket_size", type=int, default=1 << 17)
    p.add_argument("--eval_batch", type=int, default=1,
                   help="samples per fused eval forward (protocol-identical "
                   "per-sample metrics; >1 = the batched throughput path)")
    p.add_argument("--bucket_rungs", type=int, default=1,
                   help="event bucket ladder rungs (eval default: fixed bucket)")
    p.add_argument("--frames", type=int, nargs=2, default=None,
                   metavar=("START", "END"),
                   help="override the sequence's valid frame range "
                   "(reference MVSEC.py:24-31 table) — subset evals and "
                   "synthetic fixtures")
    p.add_argument("--seg_bucket", type=int, default=1 << 15,
                   help="events per raw segment for seg-events models "
                   "(gma_rnn; strided subsample / wrap-repeat)")
    p.add_argument("--config", default=None,
                   help="optional config JSON carrying model hyperparameters")
    p.add_argument("--fast_head", action="store_true",
                   help="EEMFlow: fused Pallas coarse head (f32 math, "
                   "parity to fp noise — safe for checkpoint evals)")
    p.add_argument("--fast_pyramid", action="store_true",
                   help="EEMFlow: fused Pallas pyramid body (f32 math, "
                   "parity to fp noise)")
    p.add_argument("--fast_decoders", action="store_true",
                   help="eemflow_plus: fused banded Pallas decoder chains "
                   "(f32 math, parity to fp noise — safe for checkpoint "
                   "evals)")
    p.add_argument("--fast_sgu", action="store_true",
                   help="eemflow_plus: fused SGU dense-estimator concat "
                   "chain (f32 math, parity to fp noise — safe for "
                   "checkpoint evals)")
    p.add_argument("--fast", action="store_true",
                   help="enable every parity-safe fused serving mode the "
                   "model family has (registry.fast_eval_kwargs; no-op "
                   "for families without one)")
    p.add_argument("--shard_eval", action="store_true",
                   help="shard batched eval forwards over all local "
                   "devices (data-parallel mesh; requires --eval_batch "
                   "divisible by the device count; per-sample metrics "
                   "unchanged)")
    args = p.parse_args()

    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var in this image;
    # honor an explicit cpu request through the config API (test harnesses,
    # CPU-only CI)
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_default_matmul_precision", "highest")

    from eemflow_tpu.data.mvsec import MvsecEventFlow, MvsecEventFlow_dt4
    from eemflow_tpu.eval.runner import ResearchTester as Tester
    from eemflow_tpu.models import get_eval_model
    from eemflow_tpu.utils.config import load_config, model_kwargs_from_config
    from eemflow_tpu.utils.logger import Logger

    cfg = load_config(args.config) if args.config else {}
    model_kwargs = model_kwargs_from_config(args.model, cfg)
    if args.fast_head:
        model_kwargs["fast_head"] = True
    if args.fast_pyramid:
        model_kwargs["fast_pyramid"] = True
    if args.fast_decoders:
        model_kwargs["fast_decoders"] = True
    if args.fast_sgu:
        model_kwargs["fast_sgu"] = True
    if args.fast:
        from eemflow_tpu.models import fast_eval_kwargs

        model_kwargs.update(fast_eval_kwargs(args.model))
    model = get_eval_model(args.model, **model_kwargs)

    if args.checkpoint.endswith((".pth", ".pth.tar", ".pt")):
        from eemflow_tpu.compat.torch_loader import (
            convert_for_model,
            load_torch_checkpoint,
        )

        # per-family alias / drop-list / transposed-conv registry
        sd = load_torch_checkpoint(args.checkpoint)
        sd = {k: v for k, v in sd.items() if k != "index"}
        variables = convert_for_model(args.model, sd)
    else:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(os.path.abspath(args.checkpoint))
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]

    from eemflow_tpu.models.registry import ALIASES
    from eemflow_tpu.train.adapters import get_family

    family = get_family(args.model)
    reg_name = ALIASES.get(args.model, args.model)
    if args.frames is not None:
        from eemflow_tpu.data import mvsec as mvsec_mod

        mvsec_mod.VALID_TIME_INDEX[args.sequence] = [tuple(args.frames)]
    ds_cls = MvsecEventFlow if args.event_interval == "dt1" else MvsecEventFlow_dt4
    dataset = ds_cls(
        args.data_root, sequence=args.sequence, train=False,
        eval_type=args.eval_type,
        raw_events=args.device_voxelize, bucket_size=args.bucket_size,
        bucket_rungs=args.bucket_rungs,
        with_dense=family.name in ("dense_sparse", "dense_ctx", "mimounet"),
        time_stack=family.name == "single_volume",
        # the spiking encoders read fixed input widths (STEFlow conv1: 2,
        # spiking FlowNetS: 4) — checkpoint-shape-matched count grids
        time_stack_channels={"steflow": 2, "spikeflownet": 4}.get(
            reg_name, 0),
        with_images=family.name == "event_image",
        seg_events=family.name == "seg_events",
        seg_bucket=args.seg_bucket,
    )
    if family.name == "seg_events" and "image_size" not in model_kwargs:
        # point-transformer scatter grid = the val center-crop frame
        model_kwargs["image_size"] = (256, 256)
        model = get_eval_model(args.model, **model_kwargs)
    is_car = "outdoor" in args.sequence

    preprocess = None
    if args.device_voxelize:
        from eemflow_tpu.data.device_input import make_device_preprocess

        preprocess = make_device_preprocess(
            dataset.num_bins, dataset.image_height, dataset.image_width,
            crop_size=(256, 256),  # the MVSEC val center-crop, on device
        )

    save_path = os.path.join(
        args.save_dir, f"{args.model}_{args.event_interval}_{args.sequence}"
    )
    logger = Logger(save_path)
    mesh = None
    if args.shard_eval:
        if any(k.startswith("fast") for k in model_kwargs) and (
                jax.default_backend() != "cpu"):
            # GSPMD cannot auto-partition Mosaic custom calls
            raise SystemExit("--shard_eval cannot be combined with the "
                             "fused --fast* modes on TPU; drop one")
        from eemflow_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    tester = Tester(
        model, variables, logger=logger, save_path=save_path,
        save_csv=args.save_csv, is_car=is_car,
        family=family, preprocess=preprocess, mesh=mesh,
    )
    if args.mode == "standard":
        res = tester.test_sequence(dataset, stride=args.stride,
                                   max_samples=args.max_samples,
                                   batch_size=args.eval_batch)
        logger.write_line(
            f"[{args.sequence}/{args.eval_type}] AEE {res['AEE']:.6f} "
            f"1px-out {res['pct1_outlier']:.6f} 3px-out {res['pct3_outlier']:.6f} "
            f"({res['n_samples']} samples)",
            True,
        )
    else:
        _run_research_mode(tester, dataset, args, save_path)


def _run_research_mode(tester, dataset, args, save_path: str) -> None:
    out = os.path.join(save_path, args.mode)
    if args.mode == "save_flow":
        tester.test_multi_save_flow(dataset, out, stride=args.stride,
                                    max_samples=args.max_samples)
    elif args.mode == "low_epe":
        tester.test_vis_low_epe(dataset, out, stride=args.stride,
                                max_samples=args.max_samples)
    elif args.mode == "warp":
        tester.inference_warp(dataset, out, stride=args.stride,
                              max_samples=args.max_samples)
    elif args.mode == "density":
        tester.test_multi_density(dataset, stride=args.stride,
                                  max_samples=args.max_samples)
    elif args.mode == "dsec_submission":
        tester.save_dsec_submission(dataset, out, stride=args.stride,
                                    max_samples=args.max_samples)
    elif args.mode == "warp_loss":
        tester.inference_warp_loss(dataset, stride=args.stride,
                                   max_samples=args.max_samples)
    elif args.mode == "multi_key":
        tester.test_multi_key(dataset, stride=args.stride,
                              max_samples=args.max_samples)


if __name__ == "__main__":
    main()
