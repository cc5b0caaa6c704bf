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


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
