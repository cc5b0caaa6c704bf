"""Full-pipeline golden acceptance (VERDICT r2 item 5): a committed
fixed-seed torch-oracle EEMFlow checkpoint, driven through the REAL
``tools/test_hrem.py`` CLI (torch ``.pth.tar`` ingest → converter → pad →
forward → ``flow_error`` → CSV) on a deterministic synthetic HREM
sequence, must reproduce the committed AEE within the BASELINE 0.01
budget — and the ``--device_voxelize`` path must agree with the host
path to 1e-6 (reference protocol: ``test_EEMFlow_HREM.py:115``)."""

import csv
import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
CKPT = os.path.join(HERE, "fixtures", "eemflow_hrem_golden.pth.tar")
GOLDEN = os.path.join(HERE, "fixtures", "hrem_golden.json")


def make_hrem_fixture(base, seed=99, n_events=30000):
    """Deterministic synthetic HREM test split: one sequence, two samples,
    full protocol resolution (1280×720)."""
    from eemflow_tpu.events.io import write_flo

    h, w = 720, 1280
    rng = np.random.default_rng(seed)
    root = os.path.join(base, "hrem")
    for i in range(2):
        d = os.path.join(root, "test", "dt1", "indoor_fast", f"{i:05d}")
        os.makedirs(d, exist_ok=True)
        for name in ("events1.npz", "events2.npz"):
            np.savez(
                os.path.join(d, name),
                x=rng.integers(0, w, n_events).astype(np.int32),
                y=rng.integers(0, h, n_events).astype(np.int32),
                t=np.sort(rng.integers(0, 10**9, n_events)).astype(np.int64),
                p=rng.integers(0, 2, n_events).astype(np.int8),
            )
        write_flo(
            (rng.standard_normal((h, w, 2)) * 2).astype(np.float32),
            os.path.join(d, "flow.flo"),
        )
    return root


def run_cli(root, ckpt, out_dir, extra_args=(), model="eemflow"):
    """Drive tools/test_hrem.py in a fresh process (CPU backend) and return
    the mean AEE parsed from the per-sample CSV."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "test_hrem.py"),
        "-model", model, "-int", "dt1",
        "--data_root", root, "--checkpoint", ckpt,
        "--save_dir", out_dir, "--save_csv", *extra_args,
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=1500
    )
    assert proc.returncode == 0, f"CLI failed:\n{proc.stdout}\n{proc.stderr}"
    csvs = []
    for dirpath, _, files in os.walk(out_dir):
        csvs += [os.path.join(dirpath, f) for f in files if f.endswith(".csv")]
    assert csvs, f"no CSV written under {out_dir}:\n{proc.stdout}"
    with open(csvs[0]) as f:
        rows = list(csv.DictReader(f))
    assert rows, "empty per-sample CSV"
    return float(np.mean([float(r["epe"]) for r in rows]))


@pytest.mark.zoo
def test_golden_acceptance_eemflow_cli(tmp_path):
    with open(GOLDEN) as f:
        golden = json.load(f)
    root = make_hrem_fixture(str(tmp_path), seed=golden["fixture_seed"])

    aee = run_cli(root, CKPT, str(tmp_path / "out_host"))
    assert abs(aee - golden["aee"]) < 0.01, (
        f"golden AEE drifted: got {aee}, committed {golden['aee']}"
    )

    # the device-voxelize production path must agree with the host path
    aee_dev = run_cli(
        root, CKPT, str(tmp_path / "out_dev"), extra_args=("--device_voxelize",)
    )
    assert abs(aee_dev - aee) < 1e-5, (
        f"device-voxelize AEE {aee_dev} != host-path AEE {aee}"
    )

    # ... and so must the batched-eval throughput path stacked on top of it
    # (collate pads raw-event buffers to the batch max rung; metrics stay
    # per-sample — the full combined production eval path)
    aee_dev_b2 = run_cli(
        root, CKPT, str(tmp_path / "out_dev_b2"),
        extra_args=("--device_voxelize", "--eval_batch", "2"),
    )
    assert abs(aee_dev_b2 - aee) < 1e-5, (
        f"batched device-voxelize AEE {aee_dev_b2} != host-path AEE {aee}"
    )


ERAFT_CKPT = os.path.join(HERE, "fixtures", "eraft_hrem_golden.pth.tar")
ERAFT_GOLDEN = os.path.join(HERE, "fixtures", "hrem_golden_eraft.json")


@pytest.mark.zoo
def test_golden_acceptance_eraft_cli(tmp_path):
    """The scan-family (RAFT-lineage) golden: upstream E-RAFT checkpoint
    convention ({"model": {"module.*": ...}}) -> converter -> 12-iteration
    lax.scan forward at protocol resolution -> pinned AEE.  One sample
    (the full-res CPU forward is minutes; the path, not breadth, is what
    this pins)."""
    with open(ERAFT_GOLDEN) as f:
        golden = json.load(f)
    root = make_hrem_fixture(str(tmp_path), seed=golden["fixture_seed"])
    aee = run_cli(root, ERAFT_CKPT, str(tmp_path / "out"),
                  extra_args=("--max_samples", str(golden["max_samples"])),
                  model="eraft")
    assert abs(aee - golden["aee"]) < 0.01, (
        f"eraft golden AEE drifted: got {aee}, committed {golden['aee']}"
    )


PLUS_CKPT = os.path.join(HERE, "fixtures", "eemflow_plus_hrem_golden.pth.tar")
PLUS_GOLDEN = os.path.join(HERE, "fixtures", "hrem_golden_plus.json")


@pytest.mark.zoo
def test_golden_acceptance_eemflow_plus_cli(tmp_path):
    """The coarse-to-fine SGU family golden (EEMFlow+, the paper's second
    headline model): torch ingest → converter (dead-param drop list) →
    5-level warp/correlate/decode forward at protocol resolution → pinned
    AEE.  One sample (full-res CPU forward is minutes)."""
    with open(PLUS_GOLDEN) as f:
        golden = json.load(f)
    root = make_hrem_fixture(str(tmp_path), seed=golden["fixture_seed"])
    aee = run_cli(root, PLUS_CKPT, str(tmp_path / "out"),
                  extra_args=("--max_samples", str(golden["max_samples"])),
                  model="eemflow_plus")
    assert abs(aee - golden["aee"]) < 0.01, (
        f"eemflow_plus golden AEE drifted: got {aee}, "
        f"committed {golden['aee']}"
    )


def _zoo_golden(tmp_path, model, ckpt_name, golden_name):
    """Shared body for the GRU/transformer-family goldens (VERDICT r3 item
    8): converted reference-style checkpoint → REAL CLI at protocol
    resolution → pinned AEE, one sample."""
    ckpt = os.path.join(HERE, "fixtures", ckpt_name)
    golden_path = os.path.join(HERE, "fixtures", golden_name)
    with open(golden_path) as f:
        golden = json.load(f)
    root = make_hrem_fixture(str(tmp_path), seed=golden["fixture_seed"])
    aee = run_cli(root, ckpt, str(tmp_path / "out"),
                  extra_args=("--max_samples", str(golden["max_samples"])),
                  model=model)
    assert abs(aee - golden["aee"]) < 0.01, (
        f"{model} golden AEE drifted: got {aee}, committed {golden['aee']}"
    )


@pytest.mark.zoo
def test_golden_acceptance_gma_cli(tmp_path):
    """GMA (GRU family + global motion aggregation attention)."""
    _zoo_golden(tmp_path, "gma", "gma_hrem_golden.pth.tar",
                "hrem_golden_gma.json")


@pytest.mark.zoo
def test_golden_acceptance_gmflow_cli(tmp_path):
    """GMFlow (transformer family: swin attention + global matching)."""
    _zoo_golden(tmp_path, "gmflow", "gmflow_hrem_golden.pth.tar",
                "hrem_golden_gmflow.json")


@pytest.mark.zoo
def test_golden_acceptance_flowformer_cli(tmp_path):
    """FlowFormer (latent cost tokens — the biggest zoo net)."""
    _zoo_golden(tmp_path, "flowformer", "flowformer_hrem_golden.pth.tar",
                "hrem_golden_flowformer.json")


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
