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


def make_mvsec_fixture(base, seed=55, frames=(3, 9), n_events=20000):
    """Deterministic synthetic MVSEC sequence at protocol resolution
    (346×260): per-frame event .h5 tables + flowgt_dt1/dt4 .npy + frame
    .png images (the DCEIFlow pathway), driven through the REAL
    ``tools/test_mvsec.py`` CLI with ``--frames`` overriding the valid
    range (reference table MVSEC.py:24-31 covers only the real
    recordings)."""
    import cv2

    from eemflow_tpu.events.io import write_events_h5

    h, w = 260, 346
    rng = np.random.default_rng(seed)
    root = os.path.join(base, "mvsec")
    seq_dir = os.path.join(root, "indoor_flying1")
    os.makedirs(os.path.join(seq_dir, "event"), exist_ok=True)
    os.makedirs(os.path.join(seq_dir, "image"), exist_ok=True)
    for d in ("flowgt_dt1", "flowgt_dt4"):
        os.makedirs(os.path.join(seq_dir, d), exist_ok=True)
    for i in range(frames[0] - 1, frames[1] + 9):
        ev = np.stack(
            [
                np.sort(rng.uniform(i * 0.03, (i + 1) * 0.03, n_events)),
                rng.integers(0, w, n_events).astype(np.float64),
                rng.integers(0, h, n_events).astype(np.float64),
                rng.integers(0, 2, n_events).astype(np.float64),
            ],
            axis=1,
        )
        write_events_h5(ev, os.path.join(seq_dir, "event", f"{i + 1:06d}.h5"))
        cv2.imwrite(
            os.path.join(seq_dir, "image", f"{i + 1:06d}.png"),
            rng.integers(0, 255, (h, w), np.uint8),
        )
        for d in ("flowgt_dt1", "flowgt_dt4"):
            np.save(
                os.path.join(seq_dir, d, f"{i}.npy"),
                (rng.standard_normal((2, h, w)) * 2).astype(np.float32),
            )
    return root


def run_mvsec_cli(root, ckpt, out_dir, model, dt="dt1", frames=(3, 9),
                  extra_args=()):
    """Drive tools/test_mvsec.py in a fresh process (CPU backend) and
    return the mean AEE from the per-sample CSV."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "test_mvsec.py"),
        "-model", model, "-int", dt, "--sequence", "indoor_flying1",
        "--data_root", root, "--checkpoint", ckpt,
        "--save_dir", out_dir, "--save_csv", "--stride", "1",
        "--frames", str(frames[0]), str(frames[1]), *extra_args,
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=2400
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


def _mvsec_zoo_golden(tmp_path, model, golden_name):
    """Shared body for the MVSEC-protocol goldens (VERDICT r4 item 4):
    converted reference-style checkpoint → REAL test_mvsec.py CLI
    (ingest → converter → center-crop-256 protocol → family input
    contract → forward → flow_error → CSV) → pinned AEE (reference eval
    contract: test_mvsec.py:291-346 + per-family testers)."""
    ckpt = os.path.join(HERE, "fixtures", f"{model}_mvsec_golden.pth.tar")
    golden_path = os.path.join(HERE, "fixtures", golden_name)
    with open(golden_path) as f:
        golden = json.load(f)
    root = make_mvsec_fixture(str(tmp_path), seed=golden["fixture_seed"])
    aee = run_mvsec_cli(
        root, ckpt, str(tmp_path / "out"), model,
        dt=golden.get("dt", "dt1"),
        extra_args=("--max_samples", str(golden["max_samples"]),
                    *golden.get("extra_args", [])),
    )
    assert abs(aee - golden["aee"]) < 0.01, (
        f"{model} golden AEE drifted: got {aee}, committed {golden['aee']}"
    )


@pytest.mark.zoo
def test_golden_acceptance_kpaflow_cli(tmp_path):
    """KPAFlow (kernel-patch attention decoder)."""
    _mvsec_zoo_golden(tmp_path, "kpaflow", "mvsec_golden_kpaflow.json")


@pytest.mark.zoo
def test_golden_acceptance_skflow_cli(tmp_path):
    """SKFlow (super-kernel update blocks + GMA attention)."""
    _mvsec_zoo_golden(tmp_path, "skflow", "mvsec_golden_skflow.json")


@pytest.mark.zoo
def test_golden_acceptance_gmflownet_cli(tmp_path):
    """GMFlowNet (POLA swin encoder + match head + RAFT decoder)."""
    _mvsec_zoo_golden(tmp_path, "gmflownet", "mvsec_golden_gmflownet.json")


@pytest.mark.zoo
def test_golden_acceptance_irrpwc_cli(tmp_path):
    """IRR-PWC (7-level pyramid, warp, iterative-residual refinement)."""
    _mvsec_zoo_golden(tmp_path, "irrpwc", "mvsec_golden_irrpwc.json")


@pytest.mark.zoo
def test_golden_acceptance_pwc_variant_cli(tmp_path):
    """pwcnet_irr_occ_bi (the fullest PWC variant: IRR + occlusion +
    bidirectional)."""
    _mvsec_zoo_golden(tmp_path, "pwcnet_irr_occ_bi",
                      "mvsec_golden_pwcnet_irr_occ_bi.json")


@pytest.mark.zoo
def test_golden_acceptance_steflow_cli(tmp_path):
    """STE-FlowNet (spiking-conv encoder + ConvGRU, single-volume dt4
    time stack at its fixed 2-channel input width)."""
    _mvsec_zoo_golden(tmp_path, "steflow", "mvsec_golden_steflow.json")


@pytest.mark.zoo
def test_golden_acceptance_spikeflownet_cli(tmp_path):
    """Spiking FlowNetS (accumulate-and-fire, 4-channel count grids;
    sub-resolution flow scored against nearest-subsampled GT — the
    reference downsample protocol)."""
    _mvsec_zoo_golden(tmp_path, "spikeflownet",
                      "mvsec_golden_spikeflownet.json")


@pytest.mark.zoo
def test_golden_acceptance_dceiflow_cli(tmp_path):
    """DCEIFlow (event voxel + frame image fusion — exercises the
    with_images dataset pathway)."""
    _mvsec_zoo_golden(tmp_path, "dceiflow", "mvsec_golden_dceiflow.json")


@pytest.mark.zoo
def test_golden_acceptance_gma_rnn_cli(tmp_path):
    """RAFTGMA_rnn (raw-event point transformer frontend — exercises the
    seg_events dataset pathway AND the EventTransformer converter).

    This is also the end-to-end coverage for the ``event_transformer``
    registry entry: standalone EventTransformer is a non-flow backbone
    (see tests/test_adapters.py non_flow set) whose only flow-producing
    consumer is this family, mirroring the reference where
    ``gma_rnn.py`` embeds the transformer frontend."""
    _mvsec_zoo_golden(tmp_path, "gma_rnn", "mvsec_golden_gma_rnn.json")


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
