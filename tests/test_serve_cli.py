"""End-to-end acceptance for ``tools/serve.py``: the sustained-serving CLI
(npz decode → native bucket-pack → device voxelize → forward → ``.flo``)
must reproduce, bit-near, an independent in-process forward on the same
checkpoint and events.  (The reference has no serving CLI — its nearest
analog is the ``demo()`` harness in ``model/EEMFlow/EEMFlow.py:185-231``,
which writes nothing.)"""

import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
CKPT = os.path.join(HERE, "fixtures", "eemflow_hrem_golden.pth.tar")

H, W, BUCKET = 256, 320, 8192


def _fixture(base, n_samples=3, n_events=5000):
    roots = []
    rng = np.random.default_rng(17)
    for i in range(n_samples):
        d = os.path.join(base, f"{i:05d}")
        os.makedirs(d, exist_ok=True)
        for name in ("events1.npz", "events2.npz"):
            np.savez(
                os.path.join(d, name),
                x=rng.integers(0, W, n_events).astype(np.int32),
                y=rng.integers(0, H, n_events).astype(np.int32),
                t=np.sort(rng.integers(0, 10**9, n_events)).astype(np.int64),
                p=rng.integers(0, 2, n_events).astype(np.int8),
            )
        roots.append(d)
    return roots


@pytest.mark.zoo
def test_serve_cli_matches_inprocess_forward(tmp_path):
    samples = _fixture(str(tmp_path / "data"))
    out_dir = str(tmp_path / "out")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "serve.py"),
        "-model", "eemflow", "--checkpoint", CKPT,
        "--data_root", str(tmp_path / "data"),
        "--size", str(H), str(W), "--bucket_size", str(BUCKET),
        "--loops", "2", "--warmup", "1", "--out_dir", out_dir,
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=1500
    )
    assert proc.returncode == 0, f"serve failed:\n{proc.stdout}\n{proc.stderr}"
    assert "fps wall" in proc.stdout

    import jax
    import jax.numpy as jnp

    from eemflow_tpu.compat.torch_loader import (
        convert_for_model,
        load_torch_checkpoint,
    )
    from eemflow_tpu.data.device_input import make_device_preprocess
    from eemflow_tpu.models import get_eval_model
    from eemflow_tpu.native import decode_pack_npz

    sd = {k: v for k, v in load_torch_checkpoint(CKPT).items()
          if k != "index"}
    variables = convert_for_model("eemflow", sd)
    model = get_eval_model("eemflow")
    pre = make_device_preprocess(5, H, W)

    for d in samples:
        packed = []
        for f in ("events1.npz", "events2.npz"):
            with np.load(os.path.join(d, f)) as npz:
                packed.append(decode_pack_npz(npz, BUCKET))
        batch = pre({
            "events_old": jnp.asarray(packed[0][0])[None],
            "events_new": jnp.asarray(packed[1][0])[None],
            "n_old": jnp.asarray([packed[0][1]], jnp.int32),
            "n_new": jnp.asarray([packed[1][1]], jnp.int32),
        })
        _, preds = model.apply(
            variables, batch["event_volume_old"], batch["event_volume_new"]
        )
        expected = np.asarray(preds[-1][0])

        from eemflow_tpu.events.io import read_flo

        name = os.path.relpath(d, str(tmp_path / "data")).replace(
            os.sep, "_"
        )
        got = read_flo(os.path.join(out_dir, name + ".flo"))
        np.testing.assert_allclose(got, expected, atol=1e-4)


def _stream_fixture(base, n_windows=4, n_events=5000):
    """Consecutive dt1 stream: sample i = (window i, window i+1), so
    sample i's events2 IS sample i+1's events1."""
    rng = np.random.default_rng(23)
    windows = []
    for _ in range(n_windows):
        windows.append(dict(
            x=rng.integers(0, W, n_events).astype(np.int32),
            y=rng.integers(0, H, n_events).astype(np.int32),
            t=np.sort(rng.integers(0, 10**9, n_events)).astype(np.int64),
            p=rng.integers(0, 2, n_events).astype(np.int8),
        ))
    roots = []
    for i in range(n_windows - 1):
        d = os.path.join(base, f"{i:05d}")
        os.makedirs(d, exist_ok=True)
        np.savez(os.path.join(d, "events1.npz"), **windows[i])
        np.savez(os.path.join(d, "events2.npz"), **windows[i + 1])
        roots.append(d)
    return roots


@pytest.mark.zoo
def test_serve_cli_stream_mode_matches_pair_forward(tmp_path):
    """--stream (carry the previous voxel grid, one scatter per frame)
    must produce the same flows as the pair path on a consecutive
    stream — volume reuse is a scheduling change, not a numeric one."""
    samples = _stream_fixture(str(tmp_path / "data"))
    out_dir = str(tmp_path / "out")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "serve.py"),
        "-model", "eemflow", "--checkpoint", CKPT,
        "--data_root", str(tmp_path / "data"),
        "--size", str(H), str(W), "--bucket_size", str(BUCKET),
        "--stream", "--warmup", "0", "--out_dir", out_dir,
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=1500
    )
    assert proc.returncode == 0, f"serve failed:\n{proc.stdout}\n{proc.stderr}"
    assert "stream" in proc.stdout

    import jax.numpy as jnp

    from eemflow_tpu.compat.torch_loader import (
        convert_for_model,
        load_torch_checkpoint,
    )
    from eemflow_tpu.data.device_input import make_device_preprocess
    from eemflow_tpu.events.io import read_flo
    from eemflow_tpu.models import get_eval_model
    from eemflow_tpu.native import decode_pack_npz

    sd = {k: v for k, v in load_torch_checkpoint(CKPT).items()
          if k != "index"}
    variables = convert_for_model("eemflow", sd)
    model = get_eval_model("eemflow")
    pre = make_device_preprocess(5, H, W)

    for d in samples:
        packed = []
        for f in ("events1.npz", "events2.npz"):
            with np.load(os.path.join(d, f)) as npz:
                packed.append(decode_pack_npz(npz, BUCKET))
        batch = pre({
            "events_old": jnp.asarray(packed[0][0])[None],
            "events_new": jnp.asarray(packed[1][0])[None],
            "n_old": jnp.asarray([packed[0][1]], jnp.int32),
            "n_new": jnp.asarray([packed[1][1]], jnp.int32),
        })
        _, preds = model.apply(
            variables, batch["event_volume_old"], batch["event_volume_new"]
        )
        expected = np.asarray(preds[-1][0])
        name = os.path.relpath(d, str(tmp_path / "data")).replace(
            os.sep, "_"
        )
        got = read_flo(os.path.join(out_dir, name + ".flo"))
        np.testing.assert_allclose(got, expected, atol=1e-4)


def _expected_pair_flows(samples, data_root):
    import jax.numpy as jnp

    from eemflow_tpu.compat.torch_loader import (
        convert_for_model,
        load_torch_checkpoint,
    )
    from eemflow_tpu.data.device_input import make_device_preprocess
    from eemflow_tpu.models import get_eval_model
    from eemflow_tpu.native import decode_pack_npz

    sd = {k: v for k, v in load_torch_checkpoint(CKPT).items()
          if k != "index"}
    variables = convert_for_model("eemflow", sd)
    model = get_eval_model("eemflow")
    pre = make_device_preprocess(5, H, W)
    out = {}
    for d in samples:
        packed = []
        for f in ("events1.npz", "events2.npz"):
            with np.load(os.path.join(d, f)) as npz:
                packed.append(decode_pack_npz(npz, BUCKET))
        batch = pre({
            "events_old": jnp.asarray(packed[0][0])[None],
            "events_new": jnp.asarray(packed[1][0])[None],
            "n_old": jnp.asarray([packed[0][1]], jnp.int32),
            "n_new": jnp.asarray([packed[1][1]], jnp.int32),
        })
        _, preds = model.apply(
            variables, batch["event_volume_old"], batch["event_volume_new"]
        )
        name = os.path.relpath(d, data_root).replace(os.sep, "_")
        out[name] = np.asarray(preds[-1][0])
    return out


@pytest.mark.zoo
def test_serve_cli_stream_loops_reprimes_at_wrap(tmp_path):
    """Regression (ADVICE r4): --stream with --loops > 1 must re-prime the
    carried volume at every wrap of the sample list — before the fix, the
    first frame of each repeated loop paired against the LAST sample's
    events2 and overwrote that sample's previously-correct .flo."""
    samples = _stream_fixture(str(tmp_path / "data"))
    out_dir = str(tmp_path / "out")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "serve.py"),
        "-model", "eemflow", "--checkpoint", CKPT,
        "--data_root", str(tmp_path / "data"),
        "--size", str(H), str(W), "--bucket_size", str(BUCKET),
        "--stream", "--loops", "2", "--warmup", "0", "--out_dir", out_dir,
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=1500
    )
    assert proc.returncode == 0, f"serve failed:\n{proc.stdout}\n{proc.stderr}"

    from eemflow_tpu.events.io import read_flo

    expected = _expected_pair_flows(samples, str(tmp_path / "data"))
    # loop 2 overwrites loop 1's files; they are only correct if the wrap
    # re-primed (the first sample is the wrap victim)
    for name, exp in expected.items():
        got = read_flo(os.path.join(out_dir, name + ".flo"))
        np.testing.assert_allclose(got, exp, atol=1e-4)


@pytest.mark.zoo
def test_serve_cli_stream_chunked_matches_pair_forward(tmp_path):
    """--stream --fast --chunk K (the composed round-5 headline CLI
    shape minus --bf16): chunking is a scheduling change only and --fast
    maps the exact-math siamese_stack restructure, so every frame's flow
    must match the independent pair forward to the same tolerance."""
    samples = _stream_fixture(str(tmp_path / "data"), n_windows=5)
    assert len(samples) == 4
    out_dir = str(tmp_path / "out")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "serve.py"),
        "-model", "eemflow", "--checkpoint", CKPT,
        "--data_root", str(tmp_path / "data"),
        "--size", str(H), str(W), "--bucket_size", str(BUCKET),
        "--stream", "--fast", "--chunk", "2", "--warmup", "0",
        "--out_dir", out_dir,
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=1500
    )
    assert proc.returncode == 0, f"serve failed:\n{proc.stdout}\n{proc.stderr}"
    assert "chunk=2" in proc.stdout

    from eemflow_tpu.events.io import read_flo

    expected = _expected_pair_flows(samples, str(tmp_path / "data"))
    assert len(expected) == 4
    for name, exp in expected.items():
        got = read_flo(os.path.join(out_dir, name + ".flo"))
        np.testing.assert_allclose(got, exp, atol=1e-4)


@pytest.mark.zoo
def test_serve_cli_stream_batched_parallel_streams(tmp_path):
    """--stream --batch B serves B contiguous chunks as parallel streams;
    every chunk's flows must match the pair forward (each row primes from
    its own chunk-start events1)."""
    samples = _stream_fixture(str(tmp_path / "data"), n_windows=5)
    assert len(samples) == 4
    out_dir = str(tmp_path / "out")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "serve.py"),
        "-model", "eemflow", "--checkpoint", CKPT,
        "--data_root", str(tmp_path / "data"),
        "--size", str(H), str(W), "--bucket_size", str(BUCKET),
        "--stream", "--batch", "2", "--warmup", "0", "--out_dir", out_dir,
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=1500
    )
    assert proc.returncode == 0, f"serve failed:\n{proc.stdout}\n{proc.stderr}"

    from eemflow_tpu.events.io import read_flo

    expected = _expected_pair_flows(samples, str(tmp_path / "data"))
    for name, exp in expected.items():
        got = read_flo(os.path.join(out_dir, name + ".flo"))
        np.testing.assert_allclose(got, exp, atol=1e-4)


@pytest.mark.zoo
def test_serve_cli_host_voxelize_matches_inprocess(tmp_path):
    """--host_voxelize (native C++ sparse voxelizer on the prefetch
    thread, device forward-only) must reproduce the in-process forward on
    the same host-voxelized volumes."""
    samples = _fixture(str(tmp_path / "data"), n_samples=2)
    out_dir = str(tmp_path / "out")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "serve.py"),
        "-model", "eemflow", "--checkpoint", CKPT,
        "--data_root", str(tmp_path / "data"),
        "--size", str(H), str(W), "--bucket_size", str(BUCKET),
        "--host_voxelize", "--warmup", "0", "--out_dir", out_dir,
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=1500
    )
    assert proc.returncode == 0, f"serve failed:\n{proc.stdout}\n{proc.stderr}"
    assert "hostvox" in proc.stdout

    import jax.numpy as jnp

    from eemflow_tpu.compat.torch_loader import (
        convert_for_model,
        load_torch_checkpoint,
    )
    from eemflow_tpu.events.io import read_flo
    from eemflow_tpu.models import get_eval_model
    from eemflow_tpu.native import HostVoxelizer, decode_pack_npz

    sd = {k: v for k, v in load_torch_checkpoint(CKPT).items()
          if k != "index"}
    variables = convert_for_model("eemflow", sd)
    model = get_eval_model("eemflow")
    hvox = HostVoxelizer(5, H, W, nhwc=True)

    for d in samples:
        vols = []
        for f in ("events1.npz", "events2.npz"):
            with np.load(os.path.join(d, f)) as npz:
                rows, nv, _ = decode_pack_npz(npz, BUCKET)
            vols.append(hvox(rows, nv).copy())
        _, preds = model.apply(
            variables, jnp.asarray(vols[0])[None], jnp.asarray(vols[1])[None]
        )
        expected = np.asarray(preds[-1][0])
        name = os.path.relpath(d, str(tmp_path / "data")).replace(
            os.sep, "_"
        )
        got = read_flo(os.path.join(out_dir, name + ".flo"))
        np.testing.assert_allclose(got, expected, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
