"""Voxelizer parity: device XLA scatter vs host numpy twin vs a torch oracle
replicating the reference EventSequenceToVoxelGrid_Pytorch semantics."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from eemflow_tpu.events import events_to_voxel_grid, events_to_voxel_grid_np, pad_events

RNG = np.random.default_rng(42)


def torch_voxel_oracle(events, num_bins, height, width, normalize=True):
    """Re-derived oracle of reference loader_utils.py:447-537 semantics."""
    ev = torch.from_numpy(events.astype(np.float64))
    voxel_grid = torch.zeros(num_bins, height, width, dtype=torch.float32).flatten()
    last, first = ev[-1, 0], ev[0, 0]
    deltaT = last - first
    if deltaT == 0:
        deltaT = 1.0
    ev[:, 0] = (num_bins - 1) * (ev[:, 0] - first) / deltaT
    ts = ev[:, 0]
    xs = ev[:, 1].long()
    ys = ev[:, 2].long()
    pols = ev[:, 3].float()
    pols[pols == 0] = -1
    tis = torch.floor(ts)
    tis_long = tis.long()
    dts = ts - tis
    vals_left = pols * (1.0 - dts.float())
    vals_right = pols * dts.float()

    valid = (tis < num_bins) & (tis >= 0)
    voxel_grid.index_add_(
        0, (xs[valid] + ys[valid] * width + tis_long[valid] * width * height), vals_left[valid]
    )
    valid = ((tis + 1) < num_bins) & (tis >= 0)
    voxel_grid.index_add_(
        0,
        (xs[valid] + ys[valid] * width + (tis_long[valid] + 1) * width * height),
        vals_right[valid],
    )
    voxel_grid = voxel_grid.view(num_bins, height, width)
    if normalize:
        mask = torch.nonzero(voxel_grid, as_tuple=True)
        if mask[0].size()[0] > 0:
            mean = voxel_grid[mask].mean()
            std = voxel_grid[mask].std()
            if std > 0:
                voxel_grid[mask] = (voxel_grid[mask] - mean) / std
            else:
                voxel_grid[mask] = voxel_grid[mask] - mean
    return voxel_grid.numpy()


def make_events(n, height, width, tmax=30000.0):
    t = np.sort(RNG.uniform(0, tmax, n))
    x = RNG.integers(0, width, n)
    y = RNG.integers(0, height, n)
    p = RNG.choice([-1.0, 1.0], n)
    return np.stack([t, x, y, p], axis=1)


@pytest.mark.parametrize("n,bins,h,w", [(5000, 5, 64, 86), (200, 5, 16, 16), (1, 5, 8, 8)])
def test_voxel_parity(n, bins, h, w):
    ev = make_events(n, h, w)
    ref = torch_voxel_oracle(ev.copy(), bins, h, w)
    got_np = events_to_voxel_grid_np(ev.copy(), bins, h, w)
    np.testing.assert_allclose(got_np, ref, atol=1e-4)

    padded, n_valid, _ = pad_events(ev, n + 128)
    got_dev = events_to_voxel_grid(jnp.asarray(padded), jnp.asarray(n_valid), bins, h, w)
    np.testing.assert_allclose(np.asarray(got_dev), ref, atol=2e-3)


def test_voxel_zero_polarity_mapped():
    ev = make_events(500, 16, 16)
    ev[:, 3] = np.where(ev[:, 3] < 0, 0.0, 1.0)  # 0/1 polarities
    ref = torch_voxel_oracle(ev.copy(), 5, 16, 16)
    got = events_to_voxel_grid_np(ev.copy(), 5, 16, 16)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_voxel_truncation_and_padding_consistency():
    """Padded device buffer must ignore the padding tail."""
    ev = make_events(1000, 32, 32)
    ref = events_to_voxel_grid_np(ev.copy(), 5, 32, 32)
    padded, n_valid, _ = pad_events(ev, 4096)
    got = events_to_voxel_grid(jnp.asarray(padded), jnp.asarray(n_valid), 5, 32, 32)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_batched_device_voxelizer():
    from eemflow_tpu.events import events_to_voxel_grid_batch

    evs, nvs, refs = [], [], []
    for i in range(3):
        ev = make_events(400 + 100 * i, 24, 32)
        refs.append(events_to_voxel_grid_np(ev.copy(), 5, 24, 32))
        p, n, _ = pad_events(ev, 1024)
        evs.append(p)
        nvs.append(n)
    out = events_to_voxel_grid_batch(
        jnp.asarray(np.stack(evs)), jnp.asarray(np.asarray(nvs)), 5, 24, 32
    )
    np.testing.assert_allclose(np.asarray(out), np.stack(refs), atol=2e-3)


def test_bucket_ladder_semantics():
    from eemflow_tpu.events.voxel import choose_bucket, make_ladder

    ladder = make_ladder(1 << 17, 4)
    assert ladder == (1 << 14, 1 << 15, 1 << 16, 1 << 17)
    assert choose_bucket(0, ladder) == 1 << 14
    assert choose_bucket(1 << 14, ladder) == 1 << 14
    assert choose_bucket((1 << 14) + 1, ladder) == 1 << 15
    assert choose_bucket(10**9, ladder) == 1 << 17  # caller truncates
    assert make_ladder(4096, 1) == (4096,)


def test_bucket_ladder_voxel_bit_parity():
    """Padding to a smaller rung must give the SAME grid as the worst-case
    bucket (padded rows carry zero scatter weight either way)."""
    from eemflow_tpu.events.voxel import events_to_voxel_grid

    ev = make_events(600, 24, 32)
    small, n_s, _ = pad_events(ev, 1024)
    large, n_l, _ = pad_events(ev, 8192)
    g_small = events_to_voxel_grid(jnp.asarray(small), n_s, 5, 24, 32)
    g_large = events_to_voxel_grid(jnp.asarray(large), n_l, 5, 24, 32)
    np.testing.assert_array_equal(np.asarray(g_small), np.asarray(g_large))


def test_collate_pads_mixed_buckets():
    from eemflow_tpu.data.loader import collate

    s1 = {"events_old": np.ones((1024, 4), np.float32), "n_old": np.int32(900)}
    s2 = {"events_old": np.full((4096, 4), 2.0, np.float32), "n_old": np.int32(4000)}
    out = collate([s1, s2])
    assert out["events_old"].shape == (2, 4096, 4)
    assert (out["events_old"][0, :1024] == 1).all()
    assert (out["events_old"][0, 1024:] == 0).all()
    assert (out["events_old"][1] == 2).all()
    assert out["n_old"].tolist() == [900, 4000]


def test_fused_scatter_matches_production():
    """events_to_voxel_grid_fused (combined left+right votes, one
    scatter; round-5 trace-guided experiment — measured FLAT on hardware,
    docs/PERF.md) matches the production grid to fp-reordering tolerance;
    the bf16-accumulation variant to ~1% of vote magnitude."""
    from eemflow_tpu.events.voxel import events_to_voxel_grid_fused

    ev = make_events(4096, 64, 86)
    padded, n, _ = pad_events(ev, 4096)
    ref = np.asarray(
        events_to_voxel_grid(jnp.asarray(padded), n, 5, 64, 86)
    )
    got = np.asarray(
        events_to_voxel_grid_fused(jnp.asarray(padded), n, 5, 64, 86)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)
    got16 = np.asarray(
        events_to_voxel_grid_fused(
            jnp.asarray(padded), n, 5, 64, 86, dtype=jnp.bfloat16
        )
    )
    assert np.abs(got16 - ref).max() < 0.05 * max(np.abs(ref).max(), 1.0)


def test_banked_scatter_matches_production():
    """events_to_voxel_grid_banked (bank-split scatter perf experiment)
    produces the same grid as the production single-buffer scatter, up to
    fp addition reordering; non-divisible N falls back exactly."""
    from eemflow_tpu.events.voxel import events_to_voxel_grid_banked

    ev = make_events(4096, 64, 86)
    padded, n, _ = pad_events(ev, 4096)
    ref = np.asarray(
        events_to_voxel_grid(jnp.asarray(padded), n, 5, 64, 86)
    )
    for banks in (2, 4, 8):
        got = np.asarray(
            events_to_voxel_grid_banked(
                jnp.asarray(padded), n, 5, 64, 86, banks=banks
            )
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)
    # fallback path (N % banks != 0) is bit-identical
    padded3, n3, _ = pad_events(ev[:3000], 3001)
    ref3 = np.asarray(
        events_to_voxel_grid(jnp.asarray(padded3), n3, 5, 64, 86)
    )
    got3 = np.asarray(
        events_to_voxel_grid_banked(
            jnp.asarray(padded3), n3, 5, 64, 86, banks=4
        )
    )
    np.testing.assert_array_equal(got3, ref3)


def test_zero_event_frame_is_finite_and_zero():
    """A frame with no events (n_valid=0, all-padded buffer) must produce an
    all-zero, NaN-free voxel grid through both the raw voxelizer and the
    device-preprocess path — the per-nonzero mean/std normalization
    (reference loader_utils.py:527-535) divides by an empty-set std there,
    so the guards in ``normalize_voxel_grid`` are load-bearing for serving
    empty frames."""
    import jax.numpy as jnp
    import numpy as np

    from eemflow_tpu.data.device_input import make_device_preprocess
    from eemflow_tpu.events.voxel import events_to_voxel_grid

    ev = jnp.zeros((64, 4), jnp.float32)
    grid = events_to_voxel_grid(ev, jnp.int32(0), 5, 8, 8)
    assert np.isfinite(np.asarray(grid)).all()
    assert np.asarray(grid).sum() == 0.0

    pre = make_device_preprocess(5, 8, 8)
    batch = pre({
        "events_old": ev[None], "events_new": ev[None],
        "n_old": jnp.zeros((1,), jnp.int32),
        "n_new": jnp.zeros((1,), jnp.int32),
    })
    for key in ("event_volume_old", "event_volume_new"):
        vol = np.asarray(batch[key])
        assert vol.shape == (1, 8, 8, 5)
        assert np.isfinite(vol).all() and vol.sum() == 0.0


def test_identical_timestamp_events_land_in_bin0():
    """All events sharing one timestamp: the reference voxelizer divides by
    deltaT=0 (loader_utils.py:488 → NaN grid); our guard substitutes
    deltaT=1 so every event votes into bin 0 with full weight — a
    documented defect fix, pinned here so the deviation stays deliberate."""
    import jax.numpy as jnp
    import numpy as np

    from eemflow_tpu.events.voxel import events_to_voxel_grid

    ev = np.zeros((8, 4), np.float32)
    ev[:, 0] = 0.5
    ev[:, 1] = np.arange(8)
    ev[:, 2] = 1
    ev[:, 3] = 1.0
    g = np.asarray(events_to_voxel_grid(
        jnp.asarray(ev), jnp.int32(8), 5, 4, 8, normalize=False))
    assert np.isfinite(g).all()
    np.testing.assert_array_equal(g.reshape(5, -1).sum(1),
                                  [8.0, 0.0, 0.0, 0.0, 0.0])
