"""MVSEC training CLI (reference ``train_mvsec.py`` engine usage, importable
module + CLI: the reference ships the engine without a __main__; this CLI
wires it like the HREM entry point does).

Usage:
  python tools/train_mvsec.py -model eemflow -int dt1 --sequence outdoor_day2 \
      --data_root dataset/MVSEC --config configs/mvsec_event_flow_dense.json
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description="Train on MVSEC")
    p.add_argument("-model", default="eemflow")
    p.add_argument("-int", dest="event_interval", default="dt1", choices=["dt1", "dt4"])
    p.add_argument("--sequence", default="outdoor_day2")
    p.add_argument("--config", default="configs/mvsec_event_flow_dense.json")
    p.add_argument("--data_root", default="dataset/MVSEC")
    p.add_argument("-bs", "--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--wd", type=float, default=5e-5)
    p.add_argument("--train_iters", type=int, default=200000)
    p.add_argument("--val_iters", type=int, default=5000)
    p.add_argument("-se", "--start_epoch", type=int, default=None)
    p.add_argument("--save_dir", default="runs/mvsec")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device_voxelize", action="store_true",
                   help="device-side voxelization (train aug = flips only)")
    p.add_argument("--bucket_size", type=int, default=1 << 17)
    p.add_argument("--bucket_rungs", type=int, default=4,
                   help="event bucket ladder rungs (1 = fixed worst-case bucket)")
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()

    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var in this image;
    # honor an explicit cpu request through the config API (test harnesses,
    # CPU-only CI)
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from eemflow_tpu.data.loader import batch_iterator, prefetch
    from eemflow_tpu.parallel.mesh import init_distributed
    from eemflow_tpu.data.mvsec import MvsecEventFlow, MvsecEventFlow_dt4
    from eemflow_tpu.models import get_model
    from eemflow_tpu.parallel.mesh import make_mesh, shard_batch
    from eemflow_tpu.train.checkpoint import restore_checkpoint
    from eemflow_tpu.train.optim import make_optimizer
    from eemflow_tpu.train.trainer import Trainer, create_train_state
    from eemflow_tpu.utils.config import load_config, create_save_path, snapshot_config
    from eemflow_tpu.utils.logger import Logger

    cfg = load_config(args.config) if os.path.exists(args.config) else {}
    train_args = cfg.get("data_loader", {}).get("train", {}).get("args", {})
    aug = train_args.get(
        "aug_params", {"crop_size": [256, 256], "min_scale": -0.2, "max_scale": 0.5,
                       "do_flip": True}
    )

    from eemflow_tpu.train.adapters import get_family

    family = get_family(args.model)
    ds_cls = MvsecEventFlow if args.event_interval == "dt1" else MvsecEventFlow_dt4
    num_bins = train_args.get("num_voxel_bins", 5)
    dataset = ds_cls(
        args.data_root,
        sequence=args.sequence,
        train=True,
        num_bins=num_bins,
        eval_type=train_args.get("eval_type", "dense"),
        aug_params=aug,
        rng=np.random.default_rng(args.seed),
        raw_events=args.device_voxelize,
        bucket_size=args.bucket_size,
        bucket_rungs=args.bucket_rungs,
        # family-driven batch contract (see train.adapters)
        with_dense=family.name in ("dense_sparse", "dense_ctx", "mimounet"),
        time_stack=family.name == "single_volume",
    )

    save_path = create_save_path(
        args.save_dir, f"{args.model}_{args.event_interval}_{args.sequence}",
        args.lr, args.wd,
    )
    logger = Logger(save_path)
    snapshot_config({**cfg, "cli": vars(args)}, save_path)
    logger.write_line(f"dataset: {len(dataset)} samples", True)

    from eemflow_tpu.utils.config import model_kwargs_from_config

    model = get_model(args.model, **model_kwargs_from_config(args.model, cfg))
    tx = make_optimizer(lr=args.lr, wdecay=args.wd, num_steps=args.train_iters)

    preprocess = None
    if args.device_voxelize:
        from eemflow_tpu.data.device_input import make_device_preprocess

        # random crop: the dataset crops the label host-side and emits
        # crop_y/crop_x; the grids are cropped on device with the same
        # offsets (order: voxelize full-res -> flip -> crop)
        crop = tuple(aug.get("crop_size")) if aug.get("crop_size") else None
        if crop == (dataset.image_height, dataset.image_width):
            crop = None
        preprocess = make_device_preprocess(
            num_bins, dataset.image_height, dataset.image_width,
            crop_size=crop,
        )

    init_distributed()  # multi-host no-op unless a launcher provides coords
    mesh = make_mesh(n_spatial=1)
    from eemflow_tpu.data.loader import ArenaCollate

    batches = prefetch(
        batch_iterator(
            dataset, args.batch_size, shuffle=True, seed=args.seed,
            process_index=jax.process_index(), process_count=jax.process_count(),
            # rotating warm collate buffers: slots = prefetch depth + 2 so a
            # batch still queued or mid-transfer is never overwritten
            collate_fn=ArenaCollate(slots=4),
        )
    )

    def to_device(b):
        b = {k: v for k, v in b.items() if isinstance(v, np.ndarray)}
        return shard_batch(b, mesh)

    first = to_device(next(iter(batches)))
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed), first, tx,
        family=family, preprocess=preprocess,
    )

    ckpt_dir = os.path.join(save_path, "ckpt")
    start_epoch = 0
    if args.start_epoch is not None:
        state, start_epoch = restore_checkpoint(ckpt_dir, state, args.start_epoch)
        logger.write_line(f"resumed from epoch {start_epoch}", True)

    trainer = Trainer(
        model, tx, logger=logger, checkpoint_dir=ckpt_dir, family=family,
        preprocess=preprocess,
        mixed_precision=args.bf16
        or bool(cfg.get("train", {}).get("mixed_precision", False)),
    )
    for epoch in range(start_epoch, args.train_iters // args.val_iters):
        state = trainer.train_iters(
            state, map(to_device, batches), start_epoch=epoch,
            val_iters=args.val_iters,
        )


if __name__ == "__main__":
    main()
