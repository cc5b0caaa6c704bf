"""Device-side input pipeline tests: in-jit voxelization parity with the
host path, device flips/crops vs numpy, the HREM raw-events mode end-to-end
(same augmentation draws → same model inputs), overflow accounting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eemflow_tpu.data.device_input import (
    EventOverflowCounter,
    crop_batch,
    flip_batch,
    make_device_preprocess,
)
from eemflow_tpu.events.voxel import (
    events_to_mask,
    events_to_voxel_grid_np,
    pad_events,
    voxelize_batch_nhwc,
)

RNG = np.random.default_rng(7)


def make_events(n, h, w):
    t = np.sort(RNG.uniform(0, 1e5, n))
    x = RNG.integers(0, w, n)
    y = RNG.integers(0, h, n)
    p = RNG.choice([-1.0, 1.0], n)
    return np.stack([t, x, y, p], axis=1)


def test_voxelize_batch_nhwc_matches_host():
    h, w, bins = 24, 32, 5
    evs, ns, refs = [], [], []
    for i in range(3):
        ev = make_events(300 + 50 * i, h, w)
        refs.append(events_to_voxel_grid_np(ev.copy(), bins, h, w).transpose(1, 2, 0))
        p, n, _ = pad_events(ev, 512)
        evs.append(p)
        ns.append(n)
    out = jax.jit(
        lambda e, n: voxelize_batch_nhwc(e, n, bins, h, w)
    )(jnp.asarray(np.stack(evs)), jnp.asarray(np.asarray(ns)))
    np.testing.assert_allclose(np.asarray(out), np.stack(refs), atol=2e-3)


def test_stack_pair_preprocess_bit_identical():
    """stack_pair=True (one 2B-row scatter) must be bit-identical to the
    two B-row calls — per-batch-element voxelization is independent."""
    h, w, bins = 24, 32, 5
    B, NEV = 3, 512
    eo, no, en, nn = [], [], [], []
    for i in range(B):
        p, n, _ = pad_events(make_events(300 + 40 * i, h, w), NEV)
        eo.append(p)
        no.append(n)
        p, n, _ = pad_events(make_events(260 + 30 * i, h, w), NEV)
        en.append(p)
        nn.append(n)
    batch = {
        "events_old": jnp.asarray(np.stack(eo)),
        "n_old": jnp.asarray(np.asarray(no, np.int32)),
        "events_new": jnp.asarray(np.stack(en)),
        "n_new": jnp.asarray(np.asarray(nn, np.int32)),
        "flow": jnp.ones((B, h, w, 2)),
    }
    ref = jax.jit(make_device_preprocess(bins, h, w))(batch)
    out = jax.jit(make_device_preprocess(bins, h, w, stack_pair=True))(batch)
    np.testing.assert_array_equal(
        np.asarray(out["event_volume_old"]), np.asarray(ref["event_volume_old"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["event_volume_new"]), np.asarray(ref["event_volume_new"])
    )


def test_flip_batch_matches_numpy():
    g = RNG.standard_normal((4, 6, 8, 3)).astype(np.float32)
    fh = np.asarray([True, False, True, False])
    fv = np.asarray([False, False, True, True])
    out = np.asarray(flip_batch(jnp.asarray(g), jnp.asarray(fh), jnp.asarray(fv)))
    for i in range(4):
        ref = g[i]
        if fh[i]:
            ref = ref[:, ::-1]
        if fv[i]:
            ref = ref[::-1]
        np.testing.assert_array_equal(out[i], ref)


def test_crop_batch_matches_numpy():
    g = RNG.standard_normal((3, 10, 12, 2)).astype(np.float32)
    cy = np.asarray([0, 3, 5], np.int32)
    cx = np.asarray([1, 0, 4], np.int32)
    out = np.asarray(
        crop_batch(jnp.asarray(g), jnp.asarray(cy), jnp.asarray(cx), (4, 6))
    )
    for i in range(3):
        np.testing.assert_array_equal(
            out[i], g[i, cy[i] : cy[i] + 4, cx[i] : cx[i] + 6]
        )


def test_events_to_mask_matches_histogram():
    h, w = 20, 26
    ev = make_events(400, h, w)
    p, n, _ = pad_events(ev, 512)
    got = np.asarray(events_to_mask(jnp.asarray(p), jnp.asarray(n), h, w))
    hist, _, _ = np.histogram2d(
        x=ev[:, 1], y=ev[:, 2], bins=(w, h), range=[[0, w], [0, h]]
    )
    ref = (hist.T > 0)[..., None].astype(np.float32)
    np.testing.assert_array_equal(got, ref)


def test_pad_events_overflow_counter():
    ev = make_events(100, 8, 8)
    _, n, dropped = pad_events(ev, 64)
    assert n == 64 and dropped == 36
    c = EventOverflowCounter("t")
    c.update(100, 36)
    c.update(50, 0)
    s = c.summary()
    assert s["total_dropped"] == 36 and s["samples_overflowed"] == 1
    assert 0 < s["drop_rate"] < 1


def _write_hrem_sample(d, h, w, n_events, rng):
    import os

    os.makedirs(d, exist_ok=True)
    for name in ("events1.npz", "events2.npz"):
        t = np.sort(rng.uniform(0, 0.04, n_events))
        np.savez(
            os.path.join(d, name),
            x=rng.integers(0, w, n_events).astype(np.int16),
            y=rng.integers(0, h, n_events).astype(np.int16),
            t=(t * 1e9).astype(np.int64),  # ns, reader converts to s
            p=rng.integers(0, 2, n_events).astype(np.int8),
        )
    flow = rng.standard_normal((h, w, 2)).astype(np.float32) * 2
    from eemflow_tpu.events.io import write_flo

    write_flo(flow, os.path.join(d, "flow.flo"))


def test_hrem_raw_mode_matches_host_path(tmp_path, monkeypatch):
    """Same seed → device-voxelized inputs match host-voxelized inputs and
    the flow labels agree (the --device_voxelize parity guarantee)."""
    import os

    from eemflow_tpu.data.hrem import HREMEventFlow

    h, w = 36, 48
    # shrink the HREM frame for the test
    monkeypatch.setattr(HREMEventFlow, "image_height", h)
    monkeypatch.setattr(HREMEventFlow, "image_width", w)

    root = str(tmp_path / "HREM")
    for name in ("a", "b"):
        _write_hrem_sample(
            os.path.join(root, "train", "dt1", name), h, w, 500,
            np.random.default_rng(3),
        )

    aug = {"crop_size": [h, w], "do_flip": True, "v_flip_prob": 0.9}
    host = HREMEventFlow(root, train=True, aug_params=dict(aug),
                         rng=np.random.default_rng(11))
    raw = HREMEventFlow(root, train=True, aug_params=dict(aug),
                        rng=np.random.default_rng(11),
                        raw_events=True, bucket_size=1024)

    pre = make_device_preprocess(5, h, w)
    for idx in range(2):
        s_host = host[idx]
        s_raw = raw[idx]
        batch = {
            k: jnp.asarray(np.asarray(s_raw[k])[None])
            for k in ("events_old", "events_new", "n_old", "n_new",
                      "flip_h", "flip_v")
        }
        out = jax.jit(pre)(batch)
        np.testing.assert_allclose(
            np.asarray(out["event_volume_old"][0]),
            s_host["event_volume_old"], atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out["event_volume_new"][0]),
            s_host["event_volume_new"], atol=2e-3,
        )
        np.testing.assert_allclose(s_raw["flow"], s_host["flow"], atol=1e-6)


def test_train_step_with_device_voxelize():
    """make_train_step(preprocess=...) trains end-to-end from raw events."""
    from eemflow_tpu.models.eemflow import EEMFlow
    from eemflow_tpu.train.optim import make_optimizer
    from eemflow_tpu.train.trainer import create_train_state, make_train_step

    h, w, bins, B = 64, 64, 5, 2
    evs, ns = [], []
    for _ in range(B):
        ev = make_events(600, h, w)
        p, n, _ = pad_events(ev, 1024)
        evs.append(p)
        ns.append(n)
    batch = {
        "events_old": jnp.asarray(np.stack(evs)),
        "events_new": jnp.asarray(np.stack(evs[::-1])),
        "n_old": jnp.asarray(np.asarray(ns)),
        "n_new": jnp.asarray(np.asarray(ns[::-1])),
        "flip_h": jnp.asarray([True, False]),
        "flip_v": jnp.asarray([False, False]),
        "flow": jnp.ones((B, h, w, 2), jnp.float32),
        "valid": jnp.ones((B, h, w), jnp.float32),
    }
    pre = make_device_preprocess(bins, h, w)
    model = EEMFlow()
    tx = make_optimizer(lr=1e-3, num_steps=50)
    state = create_train_state(
        model, jax.random.PRNGKey(0), batch, tx, preprocess=pre
    )
    step = make_train_step(model, tx, preprocess=pre, donate=False)
    state, m0 = step(state, batch)
    for _ in range(3):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
