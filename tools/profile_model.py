"""Profiling harness (replaces the reference's ad-hoc FPS prints with
``jax.profiler`` traces + a steps/sec summary; SURVEY.md §5 tracing row).

Writes a TensorBoard-compatible trace under --logdir and prints per-call
wall time at the same (H, W, batch) points as the reference harnesses.

Usage:
  python tools/profile_model.py -model eemflow --size 720 1280 -bs 2 \
      --logdir /tmp/eemflow_trace
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-model", default="eemflow")
    p.add_argument("--size", type=int, nargs=2, default=[720, 1280])
    p.add_argument("-bs", "--batch_size", type=int, default=2)
    p.add_argument("--bins", type=int, default=5)
    p.add_argument("--logdir", default="runs/profile")
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--eval", action="store_true",
                   help="build via get_eval_model (final-only upsample)")
    p.add_argument("--corr_fast", action="store_true",
                   help="RAFT-lineage serving mode (implies --eval)")
    p.add_argument("--fast_head", action="store_true",
                   help="EEMFlow fused Pallas coarse head (implies --eval)")
    p.add_argument("--fast", action="store_true",
                   help="every parity-safe fused serving mode the family "
                   "has (registry.fast_eval_kwargs; implies --eval)")
    p.add_argument("--fused_update", action="store_true",
                   help="RAFT-lineage fused update-block serving mode "
                   "(implies --eval)")
    p.add_argument("--train", action="store_true",
                   help="profile the full jitted TRAIN step instead of the "
                   "forward: fwd+bwd+optimizer with device-side voxelize "
                   "from raw padded events — the bench.py train leg shape "
                   "(use -bs 6 --size 512 960 for the reference point)")
    p.add_argument("--events", type=int, default=1 << 18,
                   help="--train: padded events per sample (bucket size)")
    p.add_argument("--bf16", action="store_true",
                   help="--train: mixed_precision step (bf16 fwd/bwd, "
                   "fp32 params/optimizer)")
    args = p.parse_args()

    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var in this image;
    # honor an explicit cpu request through the config API (test harnesses,
    # CPU-only CI)
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from eemflow_tpu.models import get_model
    from eemflow_tpu.models.registry import get_eval_model

    h, w = args.size
    if args.train:
        _profile_train_step(args, jax, jnp, h, w)
        return
    if (args.eval or args.corr_fast or args.fast_head or args.fast
            or args.fused_update):
        extra = {}
        if args.corr_fast:
            extra["corr_fast"] = True
        if args.fast_head:
            extra["fast_head"] = True
        if args.fused_update:
            extra["fused_update"] = True
        if args.fast:
            from eemflow_tpu.models import fast_eval_kwargs

            extra.update(fast_eval_kwargs(args.model))
        model = get_eval_model(args.model, **extra)
    else:
        model = get_model(args.model)
    rng = np.random.default_rng(0)
    ev1 = jnp.asarray(rng.standard_normal((args.batch_size, h, w, args.bins)), jnp.float32)
    ev2 = jnp.asarray(rng.standard_normal((args.batch_size, h, w, args.bins)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ev1, ev2)

    @jax.jit
    def fwd(v, a, b):
        return model.apply(v, a, b)[1][-1]

    jax.block_until_ready(fwd(variables, ev1, ev2))  # compile

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fwd(variables, ev1, ev2)
            jax.block_until_ready(out)
        dt = time.perf_counter() - t0
    print(
        f"{args.model} @ {h}x{w} b={args.batch_size}: "
        f"{dt / args.reps * 1e3:.3f} ms/call; trace written to {args.logdir}"
    )


def _profile_train_step(args, jax, jnp, h, w):
    """Trace the full jitted train step (the bench.py train-leg shape:
    device voxelize → fwd → bwd → optax update, donated state) so the
    97 ms @ b=6 512×960 point can be decomposed into fwd/bwd/optimizer/
    relayout time (reference hot loop: ``train_mvsec.py:229-286``)."""
    import numpy as np

    from eemflow_tpu.data.device_input import make_device_preprocess
    from eemflow_tpu.models import get_model
    from eemflow_tpu.train.optim import make_optimizer
    from eemflow_tpu.train.trainer import create_train_state, make_train_step

    B, NEV = args.batch_size, args.events
    rng = np.random.default_rng(0)
    evs, ns = [], []
    for _ in range(B):
        n = NEV - 1000
        ev = np.zeros((NEV, 4), np.float32)
        ev[:n, 0] = np.linspace(0.0, 0.04, n)
        ev[:n, 1] = rng.integers(0, w, n)
        ev[:n, 2] = rng.integers(0, h, n)
        ev[:n, 3] = rng.choice([-1.0, 1.0], n)
        evs.append(ev)
        ns.append(n)
    if args.model == "eemflow":  # the HREM meshflow training config
        model = get_model(args.model, out_mesh_size=True)
        gt_hw = (16, 16)
    else:
        model = get_model(args.model)
        gt_hw = (h, w)
    batch = {
        "events_old": jnp.asarray(np.stack(evs)),
        "events_new": jnp.asarray(np.stack(evs[::-1])),
        "n_old": jnp.asarray(np.asarray(ns, np.int32)),
        "n_new": jnp.asarray(np.asarray(ns[::-1], np.int32)),
        "flow": jnp.ones((B, *gt_hw, 2), jnp.float32),
        "valid": jnp.ones((B, *gt_hw), jnp.float32),
    }
    pre = make_device_preprocess(args.bins, h, w)
    tx = make_optimizer(lr=1e-5, num_steps=1000)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx,
                               preprocess=pre)
    step = make_train_step(model, tx, preprocess=pre,
                           mixed_precision=args.bf16)
    state, m = step(state, batch)  # compile
    print(f"compiled; first loss={float(m['loss']):.4f}", flush=True)

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        t0 = time.perf_counter()
        for _ in range(args.reps):
            state, m = step(state, batch)
        loss = float(m["loss"])  # fetch = the only honored sync here
        dt = time.perf_counter() - t0
    print(
        f"{args.model} TRAIN step @ {h}x{w} b={B}"
        f"{' bf16' if args.bf16 else ''}: "
        f"{dt / args.reps * 1e3:.3f} ms/step (loss={loss:.4f}); "
        f"trace written to {args.logdir}"
    )


if __name__ == "__main__":
    main()
