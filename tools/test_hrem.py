"""HREM evaluation CLI (reference ``test_EEMFlow_HREM.py``).

Loads a checkpoint — either a released PyTorch ``.pth.tar`` (converted on
the fly via ``compat.torch_loader``) or an orbax run checkpoint — and runs
the per-sequence HREM protocol ({indoor,outdoor}×{fast,slow}, stride 1,
mean of per-sequence AEE).

Usage:
  python tools/test_hrem.py -model eemflow -int dt1 --data_root dataset/HREM \
      --checkpoint checkpoints/EEMFlow_HREM_dt1.pth.tar
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eemflow_tpu.data.hrem import HREM_SEQUENCES  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description="Evaluate on HREM")
    p.add_argument("-model", default="eemflow")
    p.add_argument("-int", dest="event_interval", default="dt1", choices=["dt1", "dt4"])
    p.add_argument("--data_root", default="dataset/HREM")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--save_dir", default="runs/hrem_eval")
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--save_csv", action="store_true")
    p.add_argument(
        "--mode", default="standard",
        choices=["standard", "save_flow", "low_epe", "warp", "density",
                 "dsec_submission"],
        help="research evaluation modes (reference test_mvsec.py research "
        "methods; 'standard' = the protocol eval)",
    )
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--device_voxelize", action="store_true",
                   help="voxelize raw events on device inside the jitted forward")
    p.add_argument("--bucket_size", type=int, default=1 << 18)
    p.add_argument("--eval_batch", type=int, default=1,
                   help="samples per fused eval forward (protocol-identical "
                   "per-sample metrics; >1 = the batched throughput path)")
    p.add_argument("--bucket_rungs", type=int, default=1,
                   help="event bucket ladder rungs (eval default: fixed bucket)")
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

    # parity mode: fp32 matmuls for checkpoint-faithful numerics
    jax.config.update("jax_default_matmul_precision", "highest")

    from eemflow_tpu.data.hrem import HREMEventFlow
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

    dataset = HREMEventFlow(
        args.data_root, dt=args.event_interval, train=False,
        raw_events=args.device_voxelize, bucket_size=args.bucket_size,
        bucket_rungs=args.bucket_rungs,
    )
    preprocess = None
    if args.device_voxelize:
        from eemflow_tpu.data.device_input import make_device_preprocess

        preprocess = make_device_preprocess(
            dataset.num_bins, dataset.image_height, dataset.image_width
        )
    from eemflow_tpu.train.adapters import get_family

    save_path = os.path.join(args.save_dir, f"{args.model}_{args.event_interval}")
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
        model, variables, logger=logger, save_path=save_path, save_csv=args.save_csv,
        family=get_family(args.model), preprocess=preprocess, mesh=mesh,
    )
    seqs = [s for s in HREM_SEQUENCES if s in getattr(dataset, "nori_list", {})]
    if args.mode == "standard":
        tester.test_multi_sequence(dataset, seqs or HREM_SEQUENCES,
                                   stride=args.stride,
                                   max_samples=args.max_samples,
                                   batch_size=args.eval_batch)
    else:
        # research modes run on the first available sequence
        dataset.change_test_sequence((seqs or HREM_SEQUENCES)[0])
        out = os.path.join(save_path, args.mode)
        runner = {
            "save_flow": lambda: tester.test_multi_save_flow(
                dataset, out, stride=args.stride, max_samples=args.max_samples),
            "low_epe": lambda: tester.test_vis_low_epe(
                dataset, out, stride=args.stride, max_samples=args.max_samples),
            "warp": lambda: tester.inference_warp(
                dataset, out, stride=args.stride, max_samples=args.max_samples),
            "density": lambda: tester.test_multi_density(
                dataset, stride=args.stride, max_samples=args.max_samples),
            "dsec_submission": lambda: tester.save_dsec_submission(
                dataset, out, stride=args.stride, max_samples=args.max_samples),
        }[args.mode]
        runner()


if __name__ == "__main__":
    main()
