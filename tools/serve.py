"""Sustained serving CLI: raw event ``.npz`` pairs → optical flow, steady
state, double-buffered.

The production deployment shape the bench measures
(``bench._serving_sustained``), exposed as a drivable surface: a host
thread decodes + bucket-packs sample i+1 (native C++ packer,
``eemflow_tpu.native``) while the device runs the fused
voxelize→forward program on sample i.  The reference's nearest analog
is the ``demo()``/``time_eval()`` harness inside the model file
(``model/EEMFlow/EEMFlow.py:185-231``), which times random tensors and
writes nothing; this CLI serves real files end-to-end.

Input layout: ``--data_root`` is scanned recursively for sample dirs
containing ``events1.npz`` + ``events2.npz`` (the HREM test layout,
``loader/HREM.py:171-189``).  Output: ``<out_dir>/<sample>.flo``
(+ ``.png`` flow visualization with ``--viz``).

Through the axon remote tunnel the per-frame H2D feed and result fetch
measure network RTT, not the chip — the report separates host-decode,
dispatch, and wall legs so the chip-side rate is still readable; on a
co-located TPU VM wall fps ≈ device fps.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def find_samples(root):
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        fs = set(filenames)
        if "events1.npz" in fs and "events2.npz" in fs:
            out.append(dirpath)
    return sorted(out)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("-model", "--model", default="eemflow")
    p.add_argument("--checkpoint", default=None,
                   help=".pth.tar (converted on load) or orbax dir; "
                   "omitted = random init (pipeline smoke only)")
    p.add_argument("--data_root", required=True)
    p.add_argument("--size", type=int, nargs=2, default=[720, 1280],
                   metavar=("H", "W"))
    p.add_argument("--bins", type=int, default=5)
    p.add_argument("--bucket_size", type=int, default=1 << 16)
    p.add_argument("--batch", type=int, default=1,
                   help="samples per fused forward")
    p.add_argument("--loops", type=int, default=1,
                   help="passes over the sample list (steady-state timing)")
    p.add_argument("--warmup", type=int, default=1,
                   help="untimed leading samples (compile + cache warm)")
    p.add_argument("--fast", action="store_true",
                   help="every parity-safe fused serving mode the family "
                   "has (registry.fast_eval_kwargs)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 params+volumes (not checkpoint-parity)")
    p.add_argument("--shard", action="store_true",
                   help="shard each serve batch over all local devices "
                   "(data-parallel mesh, params replicated; --batch must "
                   "be divisible by the device count)")
    p.add_argument("--out_dir", default=None,
                   help="write <sample>.flo final flows here")
    p.add_argument("--viz", action="store_true",
                   help="also write flow-colorwheel PNGs (needs --out_dir)")
    p.add_argument("--stream", action="store_true",
                   help="treat the sample list as consecutive dt1 "
                   "stream(s): voxelize only each sample's events2 and "
                   "reuse the previous voxel grid as the old volume "
                   "(sample i's events2 must equal sample i+1's events1 — "
                   "the HREM/MVSEC dt1 layout). Steady state runs one "
                   "scatter per frame instead of two. With --batch B > 1 "
                   "the sample list is split into B contiguous chunks "
                   "served as B parallel streams (throughput mode; adds "
                   "one batch of latency per frame)")
    p.add_argument("--chunk", type=int, default=1,
                   help="stream mode: consecutive frames per stream per "
                   "dispatch, UNROLLED into one program. A per-frame "
                   "dispatch serializes scatter->forward; unrolled, XLA "
                   "overlaps frame j+1's voxelize scatter with frame j's "
                   "convs (the round-3 aggregation lesson applied to the "
                   "stream shape). Adds chunk-1 frames of latency; "
                   "requires --stream")
    p.add_argument("--host_voxelize", action="store_true",
                   help="voxelize on host prefetch cores (native C++ "
                   "sparse voxelizer) instead of on device — the "
                   "reference's own deployment shape (CPU dataloader "
                   "workers voxelize); leaves the device critical path "
                   "at forward-only. Composable with --stream")
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from eemflow_tpu.data.device_input import make_device_preprocess
    from eemflow_tpu.data.loader import prefetch
    from eemflow_tpu.models import fast_eval_kwargs, get_eval_model
    from eemflow_tpu.native import decode_pack_npz
    from eemflow_tpu.train.trainer import cast_floating

    H, W = args.size
    B = args.batch
    samples = find_samples(args.data_root)
    if not samples:
        raise SystemExit(f"no events1.npz/events2.npz pairs under "
                         f"{args.data_root}")

    if args.stream and args.shard:
        raise SystemExit("--stream carries device state between frames and "
                         "cannot be combined with --shard")
    if args.chunk < 1:
        raise SystemExit("--chunk must be >= 1")
    if args.chunk > 1 and not args.stream:
        raise SystemExit("--chunk is a --stream lever (per-frame batching "
                         "for the non-stream path is --batch)")
    if args.chunk > 1:
        # carried grids can only be (re-)primed at chunk starts, so a
        # --loops wrap landing mid-chunk would silently pair a frame
        # against the previous loop's last grid — reject up front
        per_stream = (len(samples) * args.loops) // B
        for b_ in range(B):
            for j0 in range(0, per_stream - per_stream % args.chunk,
                            args.chunk):
                for jj in range(1, args.chunk):
                    if (b_ * per_stream + j0 + jj) % len(samples) == 0:
                        raise SystemExit(
                            "--chunk: a --loops stream-wrap falls mid-chunk "
                            "(re-priming is only possible at chunk starts); "
                            "pick --chunk dividing the per-stream sample "
                            "count or drop --loops")
    if args.host_voxelize and args.shard:
        raise SystemExit("--host_voxelize feeds dense volumes through the "
                         "single-device path; drop --shard")

    kwargs = fast_eval_kwargs(args.model) if args.fast else {}
    model = get_eval_model(args.model, **kwargs)
    pre = make_device_preprocess(args.bins, H, W)

    def apply_fn(v, ev1, ev2, n1, n2):
        batch = pre({"events_old": ev1, "events_new": ev2,
                     "n_old": n1, "n_new": n2})
        vol1, vol2 = batch["event_volume_old"], batch["event_volume_new"]
        if args.bf16:
            vol1, vol2 = vol1.astype(jnp.bfloat16), vol2.astype(jnp.bfloat16)
        _, preds = model.apply(v, vol1, vol2)
        return preds[-1].astype(jnp.float32)

    step = jax.jit(apply_fn)

    hvox = None
    if args.host_voxelize:
        from eemflow_tpu.native import HostVoxelizer

        # ring must outlive the prefetch window (depth 2 batches of up to
        # 2B grids each, plus the one being built)
        hvox = HostVoxelizer(args.bins, H, W, nhwc=True,
                             ring=4 * max(B, 1) + 4)

        def apply_vols_fn(v, vol1, vol2):
            if args.bf16:
                vol1 = vol1.astype(jnp.bfloat16)
                vol2 = vol2.astype(jnp.bfloat16)
            _, preds = model.apply(v, vol1, vol2)
            return preds[-1].astype(jnp.float32)

        vol_step = jax.jit(apply_vols_fn)

    if args.stream:
        from eemflow_tpu.events.voxel import voxelize_batch_nhwc

        def vox_fn(ev, n):
            return voxelize_batch_nhwc(ev, n, args.bins, H, W)

        vox = jax.jit(vox_fn)

        def stream_step_fn(v, vol_prev, ev_new, n_new):
            vol_new = vox_fn(ev_new, n_new)
            a, b = vol_prev, vol_new
            if args.bf16:
                a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
            _, preds = model.apply(v, a, b)
            return preds[-1].astype(jnp.float32), vol_new

        stream_step = jax.jit(stream_step_fn)

        def stream_step_hostvol_fn(v, vol_prev, vol_new):
            a, b = vol_prev, vol_new
            if args.bf16:
                a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
            _, preds = model.apply(v, a, b)
            return preds[-1].astype(jnp.float32)

        stream_step_hostvol = jax.jit(stream_step_hostvol_fn)

        if args.chunk > 1:
            K = args.chunk

            def stream_chunk_fn(v, vol_prev, ev_new, n_new):
                # ev_new [K, B, N, 4]: K consecutive frames per stream,
                # unrolled — frame j's forward depends on grids j-1/j but
                # never on forward j-1, so XLA overlaps frame j+1's
                # scatter with frame j's convs
                vol = vol_prev
                outs = []
                for j in range(K):
                    vol_new = vox_fn(ev_new[j], n_new[j])
                    a, b = vol, vol_new
                    if args.bf16:
                        a = a.astype(jnp.bfloat16)
                        b = b.astype(jnp.bfloat16)
                    _, preds = model.apply(v, a, b)
                    outs.append(preds[-1].astype(jnp.float32))
                    vol = vol_new
                return jnp.stack(outs), vol

            stream_chunk = jax.jit(stream_chunk_fn)

            def stream_chunk_hostvol_fn(v, vol_prev, vols_new):
                # vols_new [K, B, H, W, bins] host-voxelized grids
                vol = vol_prev
                outs = []
                for j in range(K):
                    a, b = vol, vols_new[j]
                    if args.bf16:
                        a = a.astype(jnp.bfloat16)
                        b = b.astype(jnp.bfloat16)
                    _, preds = model.apply(v, a, b)
                    outs.append(preds[-1].astype(jnp.float32))
                    vol = vols_new[j]
                return jnp.stack(outs), vol

            stream_chunk_hostvol = jax.jit(stream_chunk_hostvol_fn)

    # ---- params ----
    if args.checkpoint and args.checkpoint.endswith((".pth", ".pth.tar",
                                                     ".pt")):
        from eemflow_tpu.compat.torch_loader import (
            convert_for_model,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(args.checkpoint)
        sd = {k: v for k, v in sd.items() if k != "index"}
        variables = convert_for_model(args.model, sd)
    elif args.checkpoint:
        import orbax.checkpoint as ocp

        target = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), *[
                jnp.zeros((B, H, W, args.bins), jnp.float32)] * 2)
        )
        variables = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.checkpoint), target
        )
    else:
        print("WARNING: no --checkpoint; serving random-init weights",
              flush=True)
        variables = model.init(jax.random.PRNGKey(0), *[
            jnp.zeros((B, H, W, args.bins), jnp.float32)] * 2)
    if args.bf16:
        variables = cast_floating(variables, jnp.bfloat16)

    in_shard = None
    if args.shard:
        if args.fast and jax.default_backend() != "cpu":
            # GSPMD cannot auto-partition Mosaic custom calls; the fused
            # serving kernels are single-device programs
            raise SystemExit("--shard cannot be combined with --fast on "
                             "TPU (Pallas kernels are not auto-"
                             "partitionable); drop one of the flags")
        from eemflow_tpu.parallel.mesh import (
            batch_sharding,
            make_mesh,
            replicated_sharding,
        )

        mesh = make_mesh()
        n_dev = mesh.shape["data"]
        if B % n_dev:
            raise SystemExit(f"--shard needs --batch divisible by "
                             f"{n_dev} devices (got {B})")
        variables = jax.device_put(variables, replicated_sharding(mesh))
        in_shard = batch_sharding(mesh)

    # ---- host decode pipeline (runs in the prefetch thread) ----
    order = samples * args.loops

    if len(order) % B:
        print(f"note: dropping {len(order) % B} tail sample(s) not filling "
              f"a batch of {B}", flush=True)

    dropped_total = [0, 0]  # [events dropped, samples affected]

    def decode_iter():
        t_host = 0.0
        for i in range(0, len(order) - len(order) % B, B):
            group = order[i : i + B]
            t0 = time.perf_counter()
            evs, ns = [], []
            for s in group:
                pair = []
                for f in ("events1.npz", "events2.npz"):
                    with np.load(os.path.join(s, f)) as npz:
                        pair.append(decode_pack_npz(npz, args.bucket_size))
                # pad_events contract: bucket overflow must be surfaced
                drops = pair[0][2] + pair[1][2]
                if drops:
                    dropped_total[0] += drops
                    dropped_total[1] += 1
                evs.append((pair[0][0], pair[1][0]))
                ns.append((pair[0][1], pair[1][1]))
            if hvox is not None:
                vol1 = np.stack([hvox(e[0], n[0])
                                 for e, n in zip(evs, ns)])
                vol2 = np.stack([hvox(e[1], n[1])
                                 for e, n in zip(evs, ns)])
                t_host += time.perf_counter() - t0
                yield group, vol1, vol2, None, None, t_host
                continue
            ev1 = np.stack([e[0] for e in evs])
            ev2 = np.stack([e[1] for e in evs])
            n1 = np.asarray([n[0] for n in ns], np.int32)
            n2 = np.asarray([n[1] for n in ns], np.int32)
            t_host += time.perf_counter() - t0
            yield group, ev1, ev2, n1, n2, t_host

    def decode_iter_stream():
        # B parallel consecutive streams: the order list is split into B
        # contiguous chunks, row b of the batch serving chunk b (B=1 is
        # the single-stream case).  Each sample contributes only its NEW
        # window; the previous grids stay resident on device (steady
        # state = one scatter + one forward per frame per stream).  A row
        # (re-)primes from its sample's events1 at its chunk start and
        # whenever its global index wraps the sample list — a --loops
        # boundary, where the carried grid would otherwise be the LAST
        # sample's events2 (wrong old volume; ADVICE r4).  Primes ride
        # the ev2/n2 slots, unused in stream mode.
        t_host = 0.0
        n_samp = len(samples)
        per_stream = len(order) // B
        for j in range(per_stream):
            t0 = time.perf_counter()
            group, evs, ns, primes = [], [], [], []
            for b in range(B):
                gidx = b * per_stream + j
                s = order[gidx]
                group.append(s)
                with np.load(os.path.join(s, "events2.npz")) as npz:
                    ev, n, drops = decode_pack_npz(npz, args.bucket_size)
                if drops:
                    dropped_total[0] += drops
                    dropped_total[1] += 1
                if j == 0 or gidx % n_samp == 0:
                    with np.load(os.path.join(s, "events1.npz")) as npz:
                        pev, pn, _ = decode_pack_npz(npz, args.bucket_size)
                    primes.append(
                        (b, hvox(pev, pn)) if hvox is not None
                        else (b, pev, pn)
                    )
                if hvox is not None:
                    evs.append(hvox(ev, n))
                else:
                    evs.append(ev)
                    ns.append(n)
            if hvox is not None:
                t_host += time.perf_counter() - t0
                yield group, np.stack(evs), primes or None, None, None, \
                    t_host
            else:
                t_host += time.perf_counter() - t0
                yield group, np.stack(evs), primes or None, \
                    np.asarray(ns, np.int32), None, t_host

    def decode_iter_stream_chunk(K):
        # --chunk: K consecutive frames per stream per dispatch (j-major
        # group order matches the [K, B] output layout).  Primes only at
        # chunk starts — mid-chunk wraps were rejected in main() above.
        t_host = 0.0
        n_samp = len(samples)
        per_stream = len(order) // B
        for j0 in range(0, per_stream - per_stream % K, K):
            t0 = time.perf_counter()
            group = [None] * (K * B)
            evs = [[None] * B for _ in range(K)]
            ns = [[0] * B for _ in range(K)]
            primes = []
            for b in range(B):
                for jj in range(K):
                    gidx = b * per_stream + j0 + jj
                    s = order[gidx]
                    group[jj * B + b] = s
                    with np.load(os.path.join(s, "events2.npz")) as npz:
                        ev, n, drops = decode_pack_npz(npz, args.bucket_size)
                    if drops:
                        dropped_total[0] += drops
                        dropped_total[1] += 1
                    if jj == 0 and (j0 == 0 or gidx % n_samp == 0):
                        with np.load(os.path.join(s, "events1.npz")) as npz:
                            pev, pn, _ = decode_pack_npz(
                                npz, args.bucket_size)
                        primes.append(
                            (b, hvox(pev, pn)) if hvox is not None
                            else (b, pev, pn)
                        )
                    if hvox is not None:
                        evs[jj][b] = hvox(ev, n)
                    else:
                        evs[jj][b] = ev
                        ns[jj][b] = n
            stacked = np.stack([np.stack(row) for row in evs])
            t_host += time.perf_counter() - t0
            if hvox is not None:
                yield group, stacked, primes or None, None, None, t_host
            else:
                yield group, stacked, primes or None, \
                    np.asarray(ns, np.int32), None, t_host

    os.makedirs(args.out_dir, exist_ok=True) if args.out_dir else None

    n_frames = 0
    t_wall0 = time.perf_counter() if args.warmup == 0 else None
    t_host_base = 0.0
    t_dispatch = 0.0
    t_host_total = 0.0
    pending = None  # (group, device result) — overlap fetch with dispatch

    def drain(item):
        nonlocal n_frames
        group, flow_dev = item
        flow = np.asarray(flow_dev)  # sync point
        if flow.ndim == 5:  # --chunk: [K, B, H, W, 2], j-major like group
            flow = flow.reshape(-1, *flow.shape[2:])
        n_frames += len(group)
        if args.out_dir:
            from eemflow_tpu.events.io import write_flo

            for s, fl in zip(group, flow):
                name = os.path.relpath(s, args.data_root).replace(
                    os.sep, "_"
                )
                write_flo(fl, os.path.join(args.out_dir, name + ".flo"))
                if args.viz:
                    import cv2

                    from eemflow_tpu.viz.flow_viz import flow_to_image

                    cv2.imwrite(
                        os.path.join(args.out_dir, name + ".png"),
                        flow_to_image(fl)[:, :, ::-1],
                    )

    done_warm = 0
    vol_prev = None  # stream mode: [B, H, W, bins], primed per row below
    if args.stream and args.chunk > 1:
        batches = decode_iter_stream_chunk(args.chunk)
    elif args.stream:
        batches = decode_iter_stream()
    else:
        batches = decode_iter()
    for group, ev1, ev2, n1, n2, t_host_total in prefetch(batches, depth=2):
        t0 = time.perf_counter()
        if args.stream and ev2:
            # (re-)prime carried rows: chunk starts and --loops wraps
            if vol_prev is None:
                vol_prev = jnp.zeros((B, H, W, args.bins), jnp.float32)
            for pr in ev2:
                if hvox is not None:
                    b, grid = pr
                    vol_prev = vol_prev.at[b].set(jnp.asarray(grid))
                else:
                    b, pev, pn = pr
                    grid = vox(jnp.asarray(pev[None]),
                               jnp.asarray(np.asarray([pn], np.int32)))
                    vol_prev = vol_prev.at[b].set(grid[0])
        if args.stream and args.chunk > 1 and hvox is not None:
            vols = jnp.asarray(ev1)  # [K, B, H, W, bins] host grids
            flow_dev, vol_prev = stream_chunk_hostvol(
                variables, vol_prev, vols
            )
        elif args.stream and args.chunk > 1:
            flow_dev, vol_prev = stream_chunk(
                variables, vol_prev, jnp.asarray(ev1), jnp.asarray(n1)
            )
        elif args.stream and hvox is not None:
            vol_new = jnp.asarray(ev1)  # [B, H, W, bins] host grids
            flow_dev = stream_step_hostvol(variables, vol_prev, vol_new)
            vol_prev = vol_new
        elif args.stream:
            flow_dev, vol_prev = stream_step(
                variables, vol_prev, jnp.asarray(ev1), jnp.asarray(n1)
            )
        elif hvox is not None:
            flow_dev = vol_step(
                variables, jnp.asarray(ev1), jnp.asarray(ev2)
            )
        else:
            if in_shard is not None:
                ev1, ev2, n1, n2 = (jax.device_put(t, in_shard)
                                    for t in (ev1, ev2, n1, n2))
            else:
                ev1, ev2, n1, n2 = (jnp.asarray(t)
                                    for t in (ev1, ev2, n1, n2))
            flow_dev = step(variables, ev1, ev2, n1, n2)
        t_dispatch += time.perf_counter() - t0
        if pending is not None:
            drain(pending)
        pending = (group, flow_dev)
        if done_warm < args.warmup:
            # reset clocks after the compile/warmup batches
            done_warm += 1
            if done_warm == args.warmup:
                drain(pending)
                pending = None
                n_frames = 0
                t_dispatch = 0.0
                t_wall0 = time.perf_counter()
                t_host_base = t_host_total
    if pending is not None:
        drain(pending)

    if dropped_total[0]:
        print(f"WARNING: bucket overflow — {dropped_total[0]} events "
              f"dropped across {dropped_total[1]} sample(s); raise "
              f"--bucket_size (currently {args.bucket_size})", flush=True)
    if t_wall0 is None or n_frames == 0:
        # every batch was warmup: outputs (if any) were still written —
        # report that and exit cleanly rather than failing the run
        print("no batches past warmup to time (outputs were written); "
              "lower --warmup or add --loops for a timed report",
              flush=True)
        return
    wall = time.perf_counter() - t_wall0
    host_ms = (t_host_total - t_host_base) * 1e3 / max(n_frames, 1)
    print(
        f"{args.model} serve @{H}x{W} b={B}"
        f"{' stream' if args.stream else ''}"
        f"{f' chunk={args.chunk}' if args.chunk > 1 else ''}"
        f"{' hostvox' if args.host_voxelize else ''}"
        f"{' fast' if args.fast else ''}{' bf16' if args.bf16 else ''}: "
        f"{n_frames} frames in {wall:.2f}s = {n_frames / wall:.1f} fps wall "
        f"(host decode {host_ms:.2f} ms/frame, "
        f"dispatch {t_dispatch * 1e3 / n_frames:.2f} ms/frame, "
        f"{jax.devices()[0].device_kind})",
        flush=True,
    )


if __name__ == "__main__":
    main()
