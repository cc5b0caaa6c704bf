"""FPS harness for any registry model (reference ``time_eval`` pattern,
``model/EEMFlow/EEMFlow.py:201-225`` / ``model/eraft.py:187-211``).

Usage:
  python tools/time_eval.py -model eemflow --size 720 1280 -bs 2
  python tools/time_eval.py -model eraft  --size 512 960  -bs 1
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
    p.add_argument("--reps", type=int, default=50)
    p.add_argument("--bf16", action="store_true", help="cast inputs/compute to bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from eemflow_tpu.models import get_model

    h, w = args.size
    model = get_model(args.model)
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    ev1 = jnp.asarray(rng.standard_normal((args.batch_size, h, w, args.bins)), dtype)
    ev2 = jnp.asarray(rng.standard_normal((args.batch_size, h, w, args.bins)), dtype)
    variables = model.init(jax.random.PRNGKey(0), ev1, ev2)

    @jax.jit
    def fwd(v, a, b):
        out = model.apply(v, a, b)[1]
        return out[-1]

    t0 = time.perf_counter()
    jax.block_until_ready(fwd(variables, ev1, ev2))
    print(f"compile: {time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(5):
        jax.block_until_ready(fwd(variables, ev1, ev2))

    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = fwd(variables, ev1, ev2)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    per_img = dt / (args.reps * args.batch_size)
    print(
        f"{args.model} @ {h}x{w} b={args.batch_size}: "
        f"{per_img * 1e3:.3f} ms/img, {1.0 / per_img:.1f} FPS "
        f"({jax.devices()[0].platform})"
    )


if __name__ == "__main__":
    main()
