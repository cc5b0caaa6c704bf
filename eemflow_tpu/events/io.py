"""File readers for event/flow data (reference ``loader/loader_utils.py:26-65``).

All readers are host-side numpy; HDF5 (pandas 'myDataset' tables) is gated on
h5py/pandas availability so the core framework has no hard dependency.
"""

from __future__ import annotations

import numpy as np


def read_compressed_events(event_path: str) -> np.ndarray:
    """Read an npz with x/y/t/p arrays → [N,4] float64 (t[s], x, y, p∈{-1,1}).

    Timestamps arrive in nanoseconds and are scaled by 1e-9; polarity is
    mapped 0/1 → ∓1 (reference ``loader_utils.py:26-42``).
    """
    d = np.load(event_path)
    p = 2 * d["p"].astype(np.float64) - 1
    return np.stack(
        [d["t"].astype(np.float64) * 1e-9, d["x"], d["y"], p], axis=1
    ).astype(np.float64)


def read_events_h5(event_path: str) -> np.ndarray:
    """Read a per-frame HDF5 event table → [N,4] [ts, x, y, p].

    Supports the reference's pandas-HDF5 'myDataset' tables
    (``loader_utils.py:44-52``; requires pytables) and a plain-h5py layout
    with ts/x/y/p datasets (root or under 'myDataset') as written by our
    encoder fallback."""
    try:
        import pandas

        f = pandas.read_hdf(event_path, "myDataset")
        return f[["ts", "x", "y", "p"]].to_numpy(dtype=np.float64)
    except (ImportError, ValueError, TypeError, KeyError):
        pass
    import h5py

    with h5py.File(event_path, "r") as f:
        g = f["myDataset"] if "myDataset" in f and hasattr(f["myDataset"], "keys") else f
        cols = [np.asarray(g[k], np.float64) for k in ("ts", "x", "y", "p")]
    return np.stack(cols, axis=1)


def write_events_h5(events: np.ndarray, event_path: str) -> None:
    """Write [N,4] [ts,x,y,p] as plain h5py datasets under 'myDataset'."""
    import h5py

    with h5py.File(event_path, "w") as f:
        g = f.create_group("myDataset")
        for i, k in enumerate(("ts", "x", "y", "p")):
            g.create_dataset(k, data=events[:, i])


def read_flo(flow_path: str) -> np.ndarray:
    """Middlebury .flo reader → [H, W, 2] float32
    (reference ``loader_utils.py:54-65``)."""
    with open(flow_path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if magic.size == 0 or magic[0] != 202021.25:
            raise ValueError(f"Invalid .flo file: {flow_path}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
        return np.resize(data, (h, w, 2))


def write_flo(flow: np.ndarray, flow_path: str) -> None:
    """Write [H, W, 2] float32 flow as Middlebury .flo."""
    h, w = flow.shape[:2]
    with open(flow_path, "wb") as f:
        np.asarray([202021.25], np.float32).tofile(f)
        np.asarray([w, h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_flow_npy(path: str) -> np.ndarray:
    """GT flow .npy as produced by the MVSEC encoder ([2,H,W] or [H,W,2])."""
    return np.load(path)


def read_pfm(path: str) -> np.ndarray:
    """PFM image reader (reference ``utils_luo/tools.py:2771-2808`` readPFM):
    'PF' = 3-channel, 'Pf' = 1-channel; negative scale ⇒ little-endian;
    rows stored bottom-up (flipped on read).  FlyingThings3D flow files are
    'PF' with the third channel unused."""
    import re

    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"Not a PFM file: {path}")
        dim_match = re.match(rb"^(\d+)\s(\d+)\s*$", f.readline())
        if not dim_match:
            raise ValueError(f"Malformed PFM header: {path}")
        width, height = map(int, dim_match.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape))


def write_pfm(image: np.ndarray, path: str, scale: float = 1.0) -> None:
    """Write a 1- or 3-channel float image as little-endian PFM."""
    image = np.asarray(image, np.float32)
    color = image.ndim == 3 and image.shape[2] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        f.write(f"{-abs(scale)}\n".encode())
        np.flipud(image).tofile(f)


def read_flow_any(path: str) -> np.ndarray:
    """Flow reader dispatching by extension (.flo Middlebury, .pfm
    FlyingThings3D — third channel dropped, RAFT ``read_gen`` convention)."""
    if path.endswith(".pfm"):
        flow = read_pfm(path).astype(np.float32)
        return flow if flow.ndim == 2 else np.ascontiguousarray(flow[:, :, :2])
    return read_flo(path)
