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


if __name__ == "__main__":
    main()
