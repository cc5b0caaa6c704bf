"""FPS harness for any registry model (reference ``time_eval`` pattern,
``model/EEMFlow/EEMFlow.py:201-225`` / ``model/eraft.py:187-211``).

Timing uses the differential lax.scan method from ``bench.py`` (serialized
per-dispatch semantics, matching the reference harness and jax.profiler
traces) — the only faithful measurement through the axon device tunnel,
where ``block_until_ready`` returns at the enqueue ack (see docs/PERF.md).

Usage:
  python tools/time_eval.py -model eemflow --size 720 1280 -bs 2
  python tools/time_eval.py -model eraft  --size 512 960  -bs 1 --k 2 6
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
    p.add_argument("--k", type=int, nargs=2, default=None,
                   help="K1 K2 scan lengths (default 4 24; use smaller "
                   "for heavy models)")
    p.add_argument("--bf16", action="store_true",
                   help="cast params+inputs to bfloat16")
    p.add_argument("--corr_fast", action="store_true",
                   help="RAFT-lineage serving mode: bf16-stored corr "
                   "volumes + bf16 tap lookup, fp32 accumulation "
                   "(~1.5x on ERAFT; <=1e-2 rel corr perturbation — "
                   "do not use for checkpoint-parity evaluation)")
    p.add_argument("--fast_head", action="store_true",
                   help="EEMFlow serving mode: the whole coarse stage "
                   "(3x correlation + 3x decoder + 1x1 fuse) as one "
                   "fused Pallas kernel; same params, f32 math, parity "
                   "to fp noise (ops/pallas/coarse_head.py)")
    p.add_argument("--fast_head_impl", default="pallas",
                   choices=["pallas", "xla"],
                   help="fused-head implementation (xla = the pure-jnp "
                   "twin of the fused math, the measurement control)")
    p.add_argument("--fast_pyramid", action="store_true",
                   help="EEMFlow serving mode: per-level stride-1 convs + "
                   "pool fused into one Pallas pass (f32 math, parity to "
                   "fp noise)")
    p.add_argument("--fast_pyramid_bf16", action="store_true",
                   help="additionally cast the fused pyramid's matmul "
                   "operands to bf16 (fp32 accum; ~2e-3 px flow "
                   "perturbation — not for checkpoint-parity evaluation)")
    p.add_argument("--fast_decoders", action="store_true",
                   help="eemflow_plus serving mode: each level's 7-conv "
                   "grouped decoder as one banded fused Pallas chain "
                   "(shuffles folded into weight perms; f32 math, parity "
                   "to fp noise; coarsest sub-halo grids fall back)")
    p.add_argument("--fast_sgu", action="store_true",
                   help="eemflow_plus serving mode: the shared SGU dense "
                   "estimator (5 concat-growing convs + linear head) as "
                   "one fused Pallas concat chain per level (f32 math, "
                   "parity to fp noise)")
    p.add_argument("--fast", action="store_true",
                   help="enable every parity-safe fused serving mode the "
                   "model family has (registry.fast_eval_kwargs)")
    p.add_argument("--fused_update", action="store_true",
                   help="RAFT-lineage serving mode: the per-iteration "
                   "update block (motion encoder + SepConvGRU + flow "
                   "head) as two banded Pallas kernels (f32 math, parity "
                   "to fp noise; ops/pallas/update_block.py)")
    p.add_argument("--fused_update_bf16", action="store_true",
                   help="bf16 matmul operands inside the fused update "
                   "block (fp32 accumulation; not checkpoint-parity)")
    args = p.parse_args()

    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var in this image;
    # honor an explicit cpu request through the config API (test harnesses,
    # CPU-only CI)
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _fwd_throughput
    from eemflow_tpu.models import get_eval_model
    from eemflow_tpu.train.trainer import cast_floating

    h, w = args.size
    k1, k2 = args.k if args.k else (4, 24)
    extra = {}
    if args.corr_fast:
        extra["corr_fast"] = True
    if args.fast_head:
        extra["fast_head"] = True
        extra["fast_head_impl"] = args.fast_head_impl
    plus = args.model == "eemflow_plus"
    if args.fast_pyramid or args.fast_pyramid_bf16:
        extra["fast_pyramid"] = True
        if args.fast_pyramid_bf16:
            extra["fast_dtype" if plus else "fast_pyramid_dtype"] = "bf16"
    if args.fast_decoders:
        extra["fast_decoders"] = True
    if args.fast_sgu:
        extra["fast_sgu"] = True
    if args.fused_update or args.fused_update_bf16:
        extra["fused_update"] = True
        if args.fused_update_bf16:
            extra["fused_dtype"] = "bf16"
    if args.fast:
        from eemflow_tpu.models import fast_eval_kwargs

        extra.update(fast_eval_kwargs(args.model))
    model = get_eval_model(args.model, **extra)
    rng = np.random.default_rng(0)
    bufs = tuple(
        jnp.asarray(rng.standard_normal((args.batch_size, h, w, args.bins)),
                    jnp.float32)
        for _ in range(max(4, min(8, k2 // 2 + 2)))
    )
    t0 = time.perf_counter()
    variables = model.init(jax.random.PRNGKey(0), bufs[0], bufs[1])
    if args.bf16:
        variables = cast_floating(variables, jnp.bfloat16)
        bufs = tuple(b.astype(jnp.bfloat16) for b in bufs)
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    apply_final = lambda v, a, b: model.apply(v, a, b)[1][-1]
    dt = _fwd_throughput(apply_final, variables, bufs, k1, k2)
    per_img = dt / args.batch_size
    print(
        f"{args.model} @ {h}x{w} b={args.batch_size}"
        f"{' bf16' if args.bf16 else ''}: "
        f"{per_img * 1e3:.3f} ms/img, {1.0 / per_img:.1f} FPS (serialized dispatch) "
        f"({jax.devices()[0].device_kind})"
    )


if __name__ == "__main__":
    main()
