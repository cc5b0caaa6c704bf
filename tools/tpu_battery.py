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
    # batch scaling of the siamese point, SERIALIZED dispatches (what
    # serve.py --host_voxelize actually runs).  Measured r5-s3 (ledger):
    # b4 4.62 / b8 5.15 / b16 3.31 ms per frame — serialized cost
    # improves slowly with B (b2 3.73 → b16 3.31 = 303 fps) but never
    # reaches the 2.48 ms (403 fps) batched MARGINAL, which excludes the
    # per-program fixed cost; quote 303 as deployable, 403 as the
    # overlap-limit upper bound.
    fwd_point("eemflow_siamese_b4", EEMFlow(siamese_stack=True),
              720, 1280, 4, k=(2, 8))
    fwd_point("eemflow_siamese_b8", EEMFlow(siamese_stack=True),
              720, 1280, 8, k=(1, 5))
    fwd_point("eemflow_siamese_b16", EEMFlow(siamese_stack=True),
              720, 1280, 16, k=(1, 4))

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

    # ---- ERAFT out-of-loop XLA levers (VERDICT r4 #6): donation and
    # per-jit compiler options measured as explicit rows.  encoder-bf16 is
    # subsumed by the flat full-bf16 row (r4 ledger); AUTO-layout pinning
    # was measured a no-op in r3. ----
    # (input-buffer donation is a speed no-op by construction here: the
    # volumes are never aliased to an output, and scan carries are already
    # reused in place inside the compiled program — no leg needed)
    def eraft_xla_leg(name, options):
        if only and not any(s in name for s in only):
            return
        try:
            m = ERAFT(upsample_all=False, corr_fast=True)
            bufs = tuple(
                jnp.asarray(rng.standard_normal((1, 512, 960, 5)),
                            jnp.float32)
                for _ in range(6)
            )
            var = m.init(jax.random.PRNGKey(0), bufs[0], bufs[1])
            apply_final = lambda v, a, b: m.apply(v, a, b)[1][-1]
            stack = jnp.stack(bufs)
            nb = len(bufs)

            def make(k):
                def f(v, s):
                    def body(acc, i):
                        a = jax.lax.dynamic_index_in_dim(
                            s, i % nb, keepdims=False)
                        b = jax.lax.dynamic_index_in_dim(
                            s, (i + 1) % nb, keepdims=False)
                        return (acc
                                + apply_final(v, a, b).mean()
                                .astype(jnp.float32)), None

                    acc, _ = jax.lax.scan(
                        body, jnp.zeros((), jnp.float32), jnp.arange(k))
                    return acc

                return (jax.jit(f).lower(var, stack)
                        .compile(compiler_options=options))

            t0 = time.perf_counter()
            t1 = _fetch_time(make(1), (var, stack), reps=reps)
            t2 = _fetch_time(make(9), (var, stack), reps=reps)
            dt = (t2 - t1) / 8
            emit(name, ms_per_img=round(dt * 1e3, 3),
                 fps=round(1.0 / dt, 2),
                 compile_s=round(time.perf_counter() - t0, 1))
        except Exception as e:
            emit(name, error=repr(e)[:200])

    eraft_xla_leg("eraft_lhs_opt",
                  {"xla_tpu_enable_latency_hiding_scheduler": "true"})

    # ---- GMFlowNet @512x960 b=1 (round-5 corr_fast wiring A/B) ----
    from eemflow_tpu.models.gmflownet import GMFlowNetModel

    # (gmflownet_parity baseline on ledger: 68.2 ms / 14.7 fps)
    fwd_point("gmflownet_corr_fast",
              GMFlowNetModel(upsample_all=False, corr_fast=True),
              512, 960, 1, k=(1, 5))

    # ---- train-step stack-pair A/B @512x960 b=6, worst-case 2^18 bucket
    # (round-5 lever: one 2B-row scatter for old+new instead of two B-row
    # calls — bit-identical grids, tests/test_device_input.py) ----
    def train_leg(name, stack_pair):
        if only and not any(s in name for s in only):
            return
        try:
            from eemflow_tpu.data.device_input import make_device_preprocess
            from eemflow_tpu.models.eemflow import EEMFlow as _EEM
            from eemflow_tpu.train.optim import make_optimizer
            from eemflow_tpu.train.trainer import (
                create_train_state,
                make_train_step,
            )

            B, NEV, TH, TW, bins = 6, 1 << 18, 512, 960, 5
            tevs, tns = [], []
            for _ in range(B):
                n = NEV - 1000
                ev = np.zeros((NEV, 4), np.float32)
                ev[:n, 0] = np.linspace(0.0, 0.04, n)
                ev[:n, 1] = rng.integers(0, TW, n)
                ev[:n, 2] = rng.integers(0, TH, n)
                ev[:n, 3] = rng.choice([-1.0, 1.0], n)
                tevs.append(ev)
                tns.append(n)
            batch = {
                "events_old": jnp.asarray(np.stack(tevs)),
                "events_new": jnp.asarray(np.stack(tevs[::-1])),
                "n_old": jnp.asarray(np.asarray(tns, np.int32)),
                "n_new": jnp.asarray(np.asarray(tns[::-1], np.int32)),
                "flow": jnp.ones((B, 16, 16, 2), jnp.float32),
                "valid": jnp.ones((B, 16, 16), jnp.float32),
            }
            pre = make_device_preprocess(bins, TH, TW,
                                         stack_pair=stack_pair)
            tmodel = _EEM(out_mesh_size=True)
            tx = make_optimizer(lr=1e-5, num_steps=1000)
            state = create_train_state(
                tmodel, jax.random.PRNGKey(0), batch, tx, preprocess=pre
            )
            step = make_train_step(tmodel, tx, preprocess=pre, donate=False)

            def make_steps(k):
                # the batch must DEPEND on the loop index or XLA's
                # while-loop LICM can hoist the loop-invariant voxelize
                # scatter out of the scan and the differential stops
                # charging it (the round-3 CSE-artifact class; the
                # timestamp nudge is arithmetic noise at fp32 but defeats
                # invariance) — production feeds a NEW batch every step
                @jax.jit
                def steps_k(st, b):
                    def body(s, i):
                        bi = dict(b)
                        bi["events_old"] = b["events_old"] + i * 1e-9
                        bi["events_new"] = b["events_new"] + i * 1e-9
                        s, m = step(s, bi)
                        return s, m["loss"]

                    _, losses = jax.lax.scan(
                        body, st, jnp.arange(k, dtype=jnp.float32))
                    return losses.sum()

                return steps_k

            t0 = time.perf_counter()
            t1 = _fetch_time(make_steps(2), (state, batch), reps=reps)
            t2 = _fetch_time(make_steps(12), (state, batch), reps=reps)
            dt = (t2 - t1) / 10
            emit(name, ms_per_step=round(dt * 1e3, 2),
                 steps_per_s=round(1.0 / dt, 3),
                 compile_s=round(time.perf_counter() - t0, 1))
        except Exception as e:
            emit(name, error=repr(e)[:200])

    train_leg("train_std", stack_pair=False)
    train_leg("train_stack_pair", stack_pair=True)

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

        # worst-case train bucket (2^18): the scatter share of the 97 ms
        # train step — same harness, 4x the events
        NEV18 = 1 << 18
        evs18, ns18 = [], []
        for _ in range(6):
            n = NEV18 - 1000
            ev = np.empty((n, 4), np.float32)
            ev[:, 0] = np.linspace(0, 0.04, n)
            ev[:, 1] = rng.integers(0, TW, n)
            ev[:, 2] = rng.integers(0, TH, n)
            ev[:, 3] = rng.choice([-1.0, 1.0], n)
            p, kv, _ = pad_events(ev, NEV18)
            evs18.append(p)
            ns18.append(kv)
        ev18 = jnp.asarray(np.stack(evs18))
        n18 = jnp.asarray(np.asarray(ns18, np.int32))
        t = _fetch_time(vox_k(1), (ev18, n18), reps=max(3, reps))
        emit("voxelize_2e18_banks1",
             ms_per_frame=round(t * 1e3 / (8 * 6), 3))

        # combined-votes (one sort+apply per grid) and bf16-accumulation
        # variants — the round-5 trace-guided scatter levers
        from eemflow_tpu.events.voxel import events_to_voxel_grid_fused

        def vox_fused_k(dtype):
            def f(e, n):
                def body(acc, i):
                    g = jax.vmap(
                        lambda ee, nn: events_to_voxel_grid_fused(
                            ee, nn, 5, TH, TW, dtype=dtype)
                    )(e + i * 1e-9, n)
                    return acc + g.sum(), None

                acc, _ = jax.lax.scan(body, 0.0,
                                      jnp.arange(8, dtype=jnp.float32))
                return acc

            return jax.jit(f)

        for nm, dt_ in (("voxelize_2e18_fused_fp32", jnp.float32),
                        ("voxelize_2e18_fused_bf16", jnp.bfloat16)):
            t = _fetch_time(vox_fused_k(dt_), (ev18, n18),
                            reps=max(3, reps))
            emit(nm, ms_per_frame=round(t * 1e3 / (8 * 6), 3))
    except Exception as e:
        emit("voxelize_banks", error=repr(e)[:200])

    emit("battery_done", device=jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
