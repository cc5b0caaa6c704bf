"""Native host-side input runtime: fused event decode + pack (C++, ctypes).

The single-core host feeding a TPU must not burn its cycles on Python
event munging (the reference's DataLoader-worker hot loop).  The C++
translation unit (``eventpack.cpp``) fuses npz/h5 column decode, timestamp
scaling + relative conversion, polarity mapping and bucket padding into
one pass writing the final float32 batch row — no intermediate arrays.

Built on first use with ``g++ -O3 -shared -fPIC`` (no pybind11 in this
image; plain C ABI + ctypes).  Everything degrades to the numpy reference
path (``events.sequence.EventSequence`` + ``events.voxel.pad_events``) when
the toolchain is unavailable or the input is unsorted — bit-identical
numerics either way (tested in ``tests/test_native.py``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False


def _so_path(src: str) -> str:
    """Build location: the package dir if writable (repo-owned, no other
    user can plant a file there); else a per-user 0700 cache dir.  Never a
    fixed world-writable path — a predictable /tmp/*.so that ctypes loads
    is a local-privilege hazard on shared hosts."""
    pkg_dir = os.path.dirname(src)
    if os.access(pkg_dir, os.W_OK):
        return os.path.join(pkg_dir, "_eventpack.so")
    cache = os.path.join(
        tempfile.gettempdir(), f"eemflow_native_{os.getuid()}"
    )
    os.makedirs(cache, mode=0o700, exist_ok=True)
    if os.stat(cache).st_uid != os.getuid():  # pre-planted by someone else
        raise OSError(f"cache dir {cache} not owned by this user")
    return os.path.join(cache, "eventpack.so")


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    src = os.path.join(os.path.dirname(__file__), "eventpack.cpp")
    try:
        so = _so_path(src)
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            # build to a unique temp name, then atomic-rename: no partially
            # written .so is ever loadable, and concurrent builders race
            # benignly (last rename wins with identical content)
            tmp = f"{so}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True,
            )
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        lib.decode_pack_i64.restype = ctypes.c_int
        lib.decode_pack_f64.restype = ctypes.c_int
        lib.voxelize_sparse.restype = ctypes.c_longlong
        lib.zero_cells.restype = None
        _LIB = lib
    except (OSError, subprocess.CalledProcessError):
        _LIB = None
    return _LIB


def have_native() -> bool:
    return _build_and_load() is not None


def _fallback(
    features: np.ndarray, bucket: int, ts_mult: float
) -> Tuple[np.ndarray, int, int]:
    """Numpy reference path (EventSequence + pad_events semantics)."""
    from eemflow_tpu.events.sequence import EventSequence
    from eemflow_tpu.events.voxel import pad_events

    if len(features) == 0:  # native path returns an all-zero buffer too
        return pad_events(np.zeros((0, 4), np.float32), bucket)
    seq = EventSequence(
        features, height=0, width=0,
        timestamp_multiplier=ts_mult, convert_to_relative=True,
    )
    return pad_events(seq.features, bucket)


def decode_pack_npz(
    npz, bucket: int, ts_mult: float = 1e6
) -> Tuple[np.ndarray, int, int]:
    """HREM npz event record → (padded [bucket,4] float32, n_valid, dropped).

    Fused native path when available; numpy path otherwise (also used for
    unsorted inputs, which the numpy path sorts).  NpzFile members are NOT
    cached — callers that also need len(t) (bucket-ladder selection)
    should decode the columns once and use ``decode_pack_arrays``."""
    t = np.ascontiguousarray(npz["t"], np.int64)
    x = np.ascontiguousarray(npz["x"], np.int16)
    y = np.ascontiguousarray(npz["y"], np.int16)
    p = np.ascontiguousarray(npz["p"], np.int8)
    return decode_pack_arrays(t, x, y, p, bucket, ts_mult)


def decode_pack_arrays(
    t: np.ndarray, x: np.ndarray, y: np.ndarray, p: np.ndarray,
    bucket: int, ts_mult: float = 1e6, out: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, int, int]:
    """Pre-decoded HREM columns (int64 t / int16 x,y / int8 p) →
    (padded [bucket,4] float32, n_valid, dropped).

    ``out``: optional preallocated [bucket,4] float32 C-contiguous buffer
    to write into (a warm pooled page beats a fresh 4 MB mmap on the
    host-bottleneck path — docs/PERF.md round 4); ignored on the numpy
    fallback path, which allocates."""
    t = np.ascontiguousarray(t, np.int64)
    x = np.ascontiguousarray(x, np.int16)
    y = np.ascontiguousarray(y, np.int16)
    p = np.ascontiguousarray(p, np.int8)
    lib = _build_and_load()
    if lib is not None:
        if out is not None:
            assert (
                out.shape == (bucket, 4)
                and out.dtype == np.float32
                and out.flags.c_contiguous
            ), "out must be a C-contiguous [bucket,4] float32 buffer"
        else:
            out = np.empty((bucket, 4), np.float32)
        n_valid = ctypes.c_longlong()
        n_dropped = ctypes.c_longlong()
        rc = lib.decode_pack_i64(
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_byte)),
            ctypes.c_longlong(len(t)),
            ctypes.c_longlong(bucket),
            ctypes.c_double(ts_mult),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(n_valid),
            ctypes.byref(n_dropped),
        )
        if rc == 0:
            return out, int(n_valid.value), int(n_dropped.value)
    # decode the npz the reader's way, then the numpy path
    feats = np.stack(
        [t.astype(np.float64) * 1e-9, x, y, 2.0 * p.astype(np.float64) - 1.0],
        axis=1,
    )
    return _fallback(feats, bucket, ts_mult)


class HostVoxelizer:
    """Native host voxelization of packed event rows → [bins, H, W] f32.

    Numerics mirror ``events.voxel.events_to_voxel_grid_np`` (the float64
    host twin, reference-parity by ``tests/test_voxel.py``) with f32 cell
    accumulation like the DEVICE scatter; the numpy twin is the fallback
    when the native lib is unavailable.  NOT thread-safe — construct one
    per worker thread.

    Strictly O(events) per call: the ~4.6 M-cell grid is never swept.  A
    stamp grid + per-call epoch detects first touches; returned grids come
    from a ring of buffers whose previously-touched cells are re-zeroed on
    reuse (``zero_cells``).  A returned grid stays valid for ``ring - 1``
    further calls (callers consume within their prefetch window, like
    ``events.voxel.BufferPool``).

    Deployment rationale (docs/PERF.md round 4): the on-device scatter
    costs ~2.3 ms/frame of serial TensorCore time; on prefetch-worker
    cores the same work runs off the device critical path, leaving the
    chip at forward-only — the reference's own CPU-voxelize shape
    (``loader/loader_utils.py:429-537`` runs in DataLoader workers)."""

    def __init__(self, num_bins: int, height: int, width: int,
                 normalize: bool = True, ring: int = 4,
                 nhwc: bool = False):
        self.num_bins, self.height, self.width = num_bins, height, width
        self.normalize = normalize
        self.nhwc = nhwc
        self._lib = _build_and_load()
        if self._lib is not None:
            cells = num_bins * height * width
            self._stamp = np.zeros(cells, np.uint32)
            self._epoch = 0
            self._ring = max(2, ring)
            # (grid, touched-idx buffer, touched count) per slot
            self._slots = []
            self._next = 0

    def __call__(self, rows: np.ndarray, n_valid: int) -> np.ndarray:
        """rows: packed [bucket, 4] float32 (t, x, y, p); first n_valid
        real.  Returns [bins, H, W] float32 — or [H, W, bins] with
        ``nhwc=True`` (the model input layout, written natively so the
        host never transposes).  Ring-owned; see class doc."""
        if self._lib is None:
            from eemflow_tpu.events.voxel import events_to_voxel_grid_np

            g = events_to_voxel_grid_np(
                np.asarray(rows[:n_valid], np.float64), self.num_bins,
                self.height, self.width, self.normalize,
            )
            return np.ascontiguousarray(g.transpose(1, 2, 0)) \
                if self.nhwc else g
        rows = np.ascontiguousarray(rows, np.float32)
        n = int(n_valid)
        cap = max(2 * n, 2)
        fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        iptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong))

        shape = ((self.height, self.width, self.num_bins) if self.nhwc
                 else (self.num_bins, self.height, self.width))
        if len(self._slots) < self._ring:
            grid = np.zeros(shape, np.float32)
            touched = np.empty(cap, np.int64)
            slot = [grid, touched, 0]
            self._slots.append(slot)
        else:
            slot = self._slots[self._next]
            self._next = (self._next + 1) % self._ring
            grid, touched, k_prev = slot
            if k_prev:  # re-zero only the cells the previous use touched
                self._lib.zero_cells(
                    fptr(grid), iptr(touched), ctypes.c_longlong(k_prev)
                )
            if len(touched) < cap:
                touched = slot[1] = np.empty(cap, np.int64)

        self._epoch += 1
        if self._epoch >= 0xFFFFFFFF:  # stamp wrap: restart cleanly
            self._stamp[:] = 0
            self._epoch = 1
        k = self._lib.voxelize_sparse(
            fptr(rows), ctypes.c_longlong(n),
            ctypes.c_int(self.num_bins), ctypes.c_int(self.height),
            ctypes.c_int(self.width),
            ctypes.c_int(1 if self.normalize else 0),
            ctypes.c_int(1 if self.nhwc else 0),
            self._stamp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.c_uint32(self._epoch),
            fptr(slot[0]), iptr(slot[1]),
        )
        slot[2] = int(k)
        return slot[0]


def decode_pack_features(
    features: np.ndarray, bucket: int, ts_mult: float = 1e6,
    map_zero_polarity: bool = False,
) -> Tuple[np.ndarray, int, int]:
    """[N,4] float64 [ts,x,y,p] (MVSEC h5 tables) → padded float32 rows."""
    lib = _build_and_load()
    feats = np.ascontiguousarray(features, np.float64)
    if lib is not None and feats.size:
        cols = np.ascontiguousarray(feats.T)  # per-column contiguous views
        out = np.empty((bucket, 4), np.float32)
        n_valid = ctypes.c_longlong()
        n_dropped = ctypes.c_longlong()
        dptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        rc = lib.decode_pack_f64(
            dptr(cols[0]), dptr(cols[1]), dptr(cols[2]), dptr(cols[3]),
            ctypes.c_longlong(len(feats)),
            ctypes.c_longlong(bucket),
            ctypes.c_double(ts_mult),
            ctypes.c_int(1 if map_zero_polarity else 0),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(n_valid),
            ctypes.byref(n_dropped),
        )
        if rc == 0:
            return out, int(n_valid.value), int(n_dropped.value)
    if map_zero_polarity and feats.size:  # match the native path's mapping
        feats = feats.copy()
        feats[feats[:, 3] == 0, 3] = -1.0
    return _fallback(feats, bucket, ts_mult)
