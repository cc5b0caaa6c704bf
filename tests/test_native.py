"""Native C++ event decoder/packer: bit-parity with the numpy reference
path, fallback behavior, and a host-side throughput sanity check."""

import io
import time

import numpy as np
import pytest

from eemflow_tpu.events.sequence import EventSequence
from eemflow_tpu.events.voxel import pad_events
from eemflow_tpu.native import (
    decode_pack_features,
    decode_pack_npz,
    have_native,
)

RNG = np.random.default_rng(4)


def _npz_dict(n, h=64, w=96, sorted_t=True):
    t = RNG.uniform(0, 0.04, n)
    if sorted_t:
        t = np.sort(t)
    return {
        "t": (t * 1e9).astype(np.int64),
        "x": RNG.integers(0, w, n).astype(np.int16),
        "y": RNG.integers(0, h, n).astype(np.int16),
        "p": RNG.integers(0, 2, n).astype(np.int8),
    }


def _numpy_reference(d, bucket):
    feats = np.stack(
        [d["t"].astype(np.float64) * 1e-9, d["x"], d["y"],
         2.0 * d["p"].astype(np.float64) - 1.0],
        axis=1,
    )
    seq = EventSequence(feats, height=0, width=0,
                        timestamp_multiplier=1e6, convert_to_relative=True)
    return pad_events(seq.features, bucket)


@pytest.mark.parametrize("n,bucket", [(1000, 2048), (3000, 2048)])
def test_decode_pack_npz_bit_parity(n, bucket):
    d = _npz_dict(n)
    got, nv, dropped = decode_pack_npz(d, bucket)
    ref, nv_ref, dropped_ref = _numpy_reference(d, bucket)
    assert (nv, dropped) == (nv_ref, dropped_ref)
    np.testing.assert_array_equal(got, ref)


def test_decode_pack_npz_empty():
    """Empty record → all-zero buffer (the numpy EventSequence path, like
    the reference's, cannot represent zero events)."""
    if not have_native():
        pytest.skip("native lib unavailable")
    got, nv, dropped = decode_pack_npz(_npz_dict(0), 64)
    assert (nv, dropped) == (0, 0)
    np.testing.assert_array_equal(got, np.zeros((64, 4), np.float32))


def test_decode_pack_npz_unsorted_falls_back():
    d = _npz_dict(500, sorted_t=False)
    got, nv, dropped = decode_pack_npz(d, 1024)
    ref, nv_ref, _ = _numpy_reference(d, 1024)
    assert nv == nv_ref
    np.testing.assert_array_equal(got, ref)  # fallback sorts like the ref


def test_decode_pack_features_parity():
    n = 800
    feats = np.stack(
        [np.sort(RNG.uniform(0, 0.04, n)), RNG.integers(0, 96, n),
         RNG.integers(0, 64, n), RNG.choice([-1.0, 1.0], n)],
        axis=1,
    )
    got, nv, dropped = decode_pack_features(feats, 1024, ts_mult=1e6)
    seq = EventSequence(feats.copy(), height=0, width=0,
                        timestamp_multiplier=1e6, convert_to_relative=True)
    ref, nv_ref, _ = pad_events(seq.features, 1024)
    assert nv == nv_ref
    np.testing.assert_array_equal(got, ref)


def test_native_builds_and_is_faster():
    if not have_native():
        pytest.skip("g++ unavailable — numpy fallback in use")
    n, bucket = 200_000, 1 << 18
    d = _npz_dict(n)
    decode_pack_npz(d, bucket)  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        decode_pack_npz(d, bucket)
    t_native = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(3):
        _numpy_reference(d, bucket)
    t_numpy = (time.perf_counter() - t0) / 3
    # fused single pass must not be slower than the multi-array numpy path
    assert t_native < t_numpy, (t_native, t_numpy)


def test_host_voxelizer_matches_numpy_twin():
    """Native sparse voxelizer vs events_to_voxel_grid_np (itself
    reference-parity, tests/test_voxel.py): f32-accumulation noise only."""
    from eemflow_tpu.events.voxel import events_to_voxel_grid_np
    from eemflow_tpu.native import HostVoxelizer, decode_pack_arrays

    rng = np.random.default_rng(11)
    H, W, bins, n = 96, 128, 5, 4000
    t = np.sort(rng.integers(0, 10**9, n)).astype(np.int64)
    x = rng.integers(0, W, n).astype(np.int16)
    y = rng.integers(0, H, n).astype(np.int16)
    p = rng.integers(0, 2, n).astype(np.int8)
    rows, nv, _ = decode_pack_arrays(t, x, y, p, 8192)
    ref = events_to_voxel_grid_np(rows[:nv].astype(np.float64), bins, H, W)

    vox = HostVoxelizer(bins, H, W)
    np.testing.assert_allclose(vox(rows, nv), ref, atol=2e-5)

    # NHWC-native layout == transpose of the CHW grid
    voxn = HostVoxelizer(bins, H, W, nhwc=True)
    np.testing.assert_allclose(
        voxn(rows, nv), ref.transpose(1, 2, 0), atol=2e-5
    )


def test_host_voxelizer_ring_reuse_and_edge_cases():
    from eemflow_tpu.events.voxel import events_to_voxel_grid_np
    from eemflow_tpu.native import HostVoxelizer, decode_pack_arrays

    rng = np.random.default_rng(12)
    H, W, bins = 64, 80, 5
    vox = HostVoxelizer(bins, H, W, ring=2)

    # zero events → all-zero finite grid (reference NaNs here; pinned fix)
    g0 = vox(np.zeros((8, 4), np.float32), 0)
    assert np.isfinite(g0).all() and np.abs(g0).max() == 0.0

    # ring slots are re-zeroed on reuse: hammer distinct inputs through a
    # 2-slot ring and re-verify each against the twin computed fresh
    inputs = []
    for i in range(5):
        n = 500 + 97 * i
        t = np.sort(rng.integers(0, 10**9, n)).astype(np.int64)
        x = rng.integers(0, W, n).astype(np.int16)
        y = rng.integers(0, H, n).astype(np.int16)
        p = rng.integers(0, 2, n).astype(np.int8)
        inputs.append(decode_pack_arrays(t, x, y, p, 2048)[:2])
    for rows, nv in inputs * 2:
        got = vox(rows, nv)
        ref = events_to_voxel_grid_np(
            rows[:nv].astype(np.float64), bins, H, W
        )
        np.testing.assert_allclose(got, ref, atol=2e-5)

    # identical-timestamp events (deltaT=0 defect, pinned): finite
    rows = np.zeros((16, 4), np.float32)
    rows[:, 1] = np.arange(16) % W
    rows[:, 2] = np.arange(16) // W
    rows[:, 3] = 1.0
    g = vox(rows, 16)
    assert np.isfinite(g).all()


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
