"""Benchmark harness — EEMFlow forward throughput at 720×1280 on one chip.

Mirrors the reference's ``time_eval`` harness
(``model/EEMFlow/EEMFlow.py:201-225``: batch=2, 720×1280, synchronized
timing, per-image FPS) so numbers are comparable point-for-point.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no FPS number (BASELINE.md); we
normalize against an assumed 100 frames/s for the CUDA reference at this
setting (the paper's "efficient, real-time" positioning; to be replaced by
a measured figure if one becomes available).  The driver target is ≥10×.
"""

from __future__ import annotations

import json
import time

ASSUMED_CUDA_BASELINE_FPS = 100.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eemflow_tpu.models.eemflow import EEMFlow

    batch, h, w, bins = 2, 720, 1280, 5
    model = EEMFlow()
    rng = np.random.default_rng(0)
    ev1 = jnp.asarray(rng.standard_normal((batch, h, w, bins)), jnp.float32)
    ev2 = jnp.asarray(rng.standard_normal((batch, h, w, bins)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ev1, ev2)

    @jax.jit
    def fwd(variables, a, b):
        return model.apply(variables, a, b)[1][-1]

    # rotating inputs so no dispatch-level caching can flatter the number
    evs = [ev1, ev2] + [
        jnp.asarray(rng.standard_normal((batch, h, w, bins)), jnp.float32)
        for _ in range(2)
    ]

    # warmup / compile
    out = fwd(variables, evs[0], evs[1])
    jax.block_until_ready(out)
    for i in range(5):
        jax.block_until_ready(fwd(variables, evs[i % 4], evs[(i + 1) % 4]))

    # synchronize every rep, like the reference's cuda-synchronized harness
    # (EEMFlow.py:217) — pipelined timing through the device tunnel is not
    # faithful for un-awaited dispatches
    reps = 50
    t0 = time.perf_counter()
    for i in range(reps):
        out = fwd(variables, evs[i % 4], evs[(i + 1) % 4])
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = reps * batch / dt
    print(
        json.dumps(
            {
                "metric": "EEMFlow fwd frames/sec/chip @720x1280 b=2",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / ASSUMED_CUDA_BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
