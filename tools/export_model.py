"""Export a trained model's inference function as a serialized StableHLO
artifact (`jax.export`) for serving without Python model code.

The reference has no export story (serving = loading the torch module in
Python, ``test_EEMFlow_HREM.py:62``); for production TPU serving the
portable artifact is a versioned StableHLO module that any JAX runtime —
or a C++ PJRT host — can load and run.

Usage:
  python tools/export_model.py -model eemflow --checkpoint ckpt.pth.tar \
      --size 720 1280 -bs 1 --out eemflow_720x1280.stablehlo
  # verify a round-trip on this host:
  python tools/export_model.py ... --selftest

The exported callable is the eval forward: (params, events1, events2) are
baked at export time (params become constants), the inputs are the two
[B,H,W,bins] voxel grids, the output is the final flow [B,H,W,2].
RAFT-lineage models are built via ``get_eval_model`` (final-only convex
upsample — identical final flow, ~20% faster).
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-model", default="eemflow")
    p.add_argument("--checkpoint", default=None,
                   help=".pth(.tar) torch or orbax dir; random init if absent")
    p.add_argument("--size", type=int, nargs=2, default=[720, 1280])
    p.add_argument("-bs", "--batch_size", type=int, default=1)
    p.add_argument("--bins", type=int, default=5)
    p.add_argument("--bf16", action="store_true",
                   help="cast params+inputs to bfloat16 in the artifact")
    p.add_argument("--out", default=None)
    p.add_argument("--selftest", action="store_true",
                   help="deserialize the artifact and check it matches")
    args = p.parse_args()

    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var in this image;
    # honor an explicit cpu request through the config API (test harnesses,
    # CPU-only CI)
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from eemflow_tpu.models import get_eval_model
    from eemflow_tpu.train.trainer import cast_floating

    model = get_eval_model(args.model)
    H, W = args.size
    B, bins = args.batch_size, args.bins
    spec = jax.ShapeDtypeStruct((B, H, W, bins), jnp.float32)
    zeros = jnp.zeros(spec.shape, spec.dtype)

    if args.checkpoint and args.checkpoint.endswith((".pth", ".pth.tar", ".pt")):
        from eemflow_tpu.compat.torch_loader import (
            eemflow_alias, eraft_alias, load_torch_checkpoint,
            torch_state_dict_to_flax,
        )

        alias = {"eemflow": eemflow_alias}.get(args.model, eraft_alias)
        sd = load_torch_checkpoint(args.checkpoint)
        sd = {k: v for k, v in sd.items() if k != "index"}
        variables = torch_state_dict_to_flax(sd, alias=alias)
    elif args.checkpoint:
        import orbax.checkpoint as ocp

        # training saves a full TrainState (step/params/opt_state,
        # train/checkpoint.py) — restore untyped and take the model variables
        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.checkpoint)
        )
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
    else:
        variables = model.init(jax.random.PRNGKey(0), zeros, zeros)

    if args.bf16:
        variables = cast_floating(variables, jnp.bfloat16)

    def infer(events1, events2):
        if args.bf16:
            events1 = events1.astype(jnp.bfloat16)
            events2 = events2.astype(jnp.bfloat16)
        out = model.apply(variables, events1, events2)
        flow = out[1][-1]
        return flow.astype(jnp.float32)

    exported = jexport.export(jax.jit(infer))(spec, spec)
    blob = exported.serialize()
    out = args.out or f"{args.model}_{H}x{W}_b{B}.stablehlo"
    with open(out, "wb") as f:
        f.write(blob)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    print(f"exported {args.model} ({n_params/1e6:.2f} MParams) "
          f"[{B},{H},{W},{bins}]x2 -> {out} ({len(blob)/1e6:.1f} MB, "
          f"platforms={exported.platforms})")

    if args.selftest:
        rng = np.random.default_rng(0)
        e1 = jnp.asarray(rng.standard_normal(spec.shape), jnp.float32)
        e2 = jnp.asarray(rng.standard_normal(spec.shape), jnp.float32)
        with open(out, "rb") as f:
            rt = jexport.deserialize(f.read())
        got = rt.call(e1, e2)
        want = infer(e1, e2)
        err = float(jnp.max(jnp.abs(got - want)))
        print(f"selftest max|Δ| = {err:.2e}")
        assert err < 1e-4, "round-trip mismatch"


if __name__ == "__main__":
    main()
