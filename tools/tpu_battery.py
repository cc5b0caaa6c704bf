"""One-shot hardware A/B battery for the round-3 serving candidates.

Runs every pending measurement from docs/PERF.md §"candidates built
during the axon outage" — EEMFlow/EEMFlow+ fused serving modes, ERAFT
mask-deferral + fused update block, banked voxel scatter — each leg
guarded, each result printed as one JSON line (append to
docs/BENCH_r3_tpu.json or paste into docs/PERF.md).

Usage (on the real TPU; probe the tunnel first — see the verify notes):
    python tools/tpu_battery.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="fewer differential reps (smoke the battery)")
    ap.add_argument("--only", default=None,
                    help="comma-separated substring filter: run only legs "
                    "whose name contains one of these (others emit nothing)")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import _fetch_time, _fwd_throughput

    reps = 2 if args.quick else 5
    rng = np.random.default_rng(0)

    def emit(name, **kv):
        print(json.dumps({"leg": name, **kv}), flush=True)

    only = args.only.split(",") if args.only else None

    def fwd_point(name, model, H, W, B, k=(2, 10), bins=5, bf16=False):
        if only and not any(s in name for s in only):
            return None
        try:
            bufs = tuple(
                jnp.asarray(rng.standard_normal((B, H, W, bins)),
                            jnp.float32)
                for _ in range(max(4, k[1] // 2 + 2))
            )
            var = model.init(jax.random.PRNGKey(0), bufs[0], bufs[1])
            if bf16:  # serving mode: bf16 params + volumes (not parity)
                from eemflow_tpu.train.trainer import cast_floating

                var = cast_floating(var, jnp.bfloat16)
                bufs = tuple(b.astype(jnp.bfloat16) for b in bufs)
            apply_final = lambda v, a, b: model.apply(v, a, b)[1][-1]
            t0 = time.perf_counter()
            dt = _fwd_throughput(apply_final, var, bufs, *k, reps=reps)
            emit(name, ms_per_img=round(dt / B * 1e3, 3),
                 fps=round(B / dt, 2),
                 compile_s=round(time.perf_counter() - t0, 1))
            return var
        except Exception as e:
            emit(name, error=repr(e)[:200])
            return None

    # ---- EEMFlow @720x1280 b=2 ----
    from eemflow_tpu.models.eemflow import EEMFlow

    fwd_point("eemflow_std", EEMFlow(), 720, 1280, 2)
    # round-5 battery verdicts (docs/PERF.md "Round 5"): siamese_stack WON
    # (+29.5%, promoted into --fast); stacked_coarse, b=8 batching, the
    # Pallas fast modes, and every ERAFT/EEMFlow+ restructure LOST and are
    # retired from the battery (the ledger holds their numbers) — re-add a
    # leg only with new evidence.
    fwd_point("eemflow_siamese", EEMFlow(siamese_stack=True), 720, 1280, 2)
    fwd_point("eemflow_siamese_bf16",
              EEMFlow(siamese_stack=True), 720, 1280, 2, bf16=True)

    # ---- EEMFlow+ @720x1280 b=2 ----
    from eemflow_tpu.models.eemflow_plus import EEMFlowPlus

    fwd_point("eemflow_plus_std", EEMFlowPlus(), 720, 1280, 2)
    # (eemflow_plus_siamese retired round 5: 48.4 vs 54.5 fps — the per-
    # level conv1x1 pairs make the 2B-stack relayout net-negative)
    # (eemflow_plus_fast retired round 4: its scoped-VMEM failure was
    # fixed, exposing a Mosaic "tpu.concatenate offset mismatch" in the
    # dense-concat decoder chains; not rewritten because all three
    # measured kernels of this banded family LOSE 1.4-1.8x on hardware —
    # docs/PERF.md negative-results ledger)

    # ---- ERAFT @512x960 b=1 (k smaller: heavy model) ----
    from eemflow_tpu.models.eraft import ERAFT

    fwd_point("eraft_corr_fast_maskdefer",
              ERAFT(upsample_all=False, corr_fast=True), 512, 960, 1,
              k=(1, 9))
    # (eraft_siamese retired round 5: 23.7 vs 31.9 fps — the 2B stack
    # doubles the instance-norm reduce extents in the op-count-bound tail;
    # eraft_fused_update/_bf16 retired rounds 4-5: banded-Pallas loss)

    # ---- GMFlowNet @512x960 b=1 (round-5 corr_fast wiring A/B) ----
    from eemflow_tpu.models.gmflownet import GMFlowNetModel

    # (gmflownet_parity baseline on ledger: 68.2 ms / 14.7 fps)
    fwd_point("gmflownet_corr_fast",
              GMFlowNetModel(upsample_all=False, corr_fast=True),
              512, 960, 1, k=(1, 5))

    # ---- banked voxel scatter, b=6 @2^16, 8x per fetch ----
    if only and not any(s in "voxelize_banks" for s in only):
        emit("battery_done", device=jax.devices()[0].device_kind)
        return
    try:
        from eemflow_tpu.events.voxel import (
            events_to_voxel_grid,
            events_to_voxel_grid_banked,
            pad_events,
        )

        TH, TW, NEV = 512, 960, 1 << 16
        evs, ns = [], []
        for _ in range(6):
            n = NEV - 1000
            ev = np.empty((n, 4), np.float32)
            ev[:, 0] = np.linspace(0, 0.04, n)
            ev[:, 1] = rng.integers(0, TW, n)
            ev[:, 2] = rng.integers(0, TH, n)
            ev[:, 3] = rng.choice([-1.0, 1.0], n)
            p, kv, _ = pad_events(ev, NEV)
            evs.append(p)
            ns.append(kv)
        ev6 = jnp.asarray(np.stack(evs))
        n6 = jnp.asarray(np.asarray(ns, np.int32))

        def vox_k(banks):
            def f(e, n):
                def body(acc, i):
                    fn = (events_to_voxel_grid if banks == 1 else
                          functools.partial(events_to_voxel_grid_banked,
                                            banks=banks))
                    g = jax.vmap(lambda ee, nn: fn(ee, nn, 5, TH, TW))(
                        e + i * 1e-9, n)
                    return acc + g.sum(), None
                acc, _ = jax.lax.scan(body, 0.0,
                                      jnp.arange(8, dtype=jnp.float32))
                return acc
            return jax.jit(f)

        # banks>1 retired (measured monotone loss twice: r4 + r5 ledger)
        for banks in (1,):
            t = _fetch_time(vox_k(banks), (ev6, n6), reps=max(3, reps))
            emit(f"voxelize_banks{banks}",
                 ms_per_frame=round(t * 1e3 / (8 * 6), 3))
    except Exception as e:
        emit("voxelize_banks", error=repr(e)[:200])

    emit("battery_done", device=jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
