"""Generate the golden acceptance fixture (run once, artifacts committed).

Produces ``eemflow_hrem_golden.pth.tar`` — a fixed-seed torch-oracle
EEMFlow checkpoint saved the reference way (``module.``-prefixed
``state_dict`` inside a dict, ``test_EEMFlow_HREM.py:62-66``) — and
``hrem_golden.json`` with the expected protocol AEE of that checkpoint on
the deterministic synthetic HREM sequence built by
``tests/test_golden_acceptance.py::make_hrem_fixture``.

The expected AEE is computed by driving the REAL CLI
(``tools/test_hrem.py``: torch ingest → converter → InputPadder → forward
→ flow_error → CSV) on the CPU backend; the committed value turns the
BASELINE "EPE within 0.01" target into a re-runnable in-repo assertion.
"""

import json
import os
import subprocess
import sys

import torch

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    from torch_oracles import OracleEEMFlow

    from test_golden_acceptance import make_hrem_fixture, run_cli

    torch.manual_seed(1234)
    oracle = OracleEEMFlow().eval()
    sd = {"module." + k: v for k, v in oracle.state_dict().items()}
    ckpt = os.path.join(HERE, "eemflow_hrem_golden.pth.tar")
    torch.save({"state_dict": sd}, ckpt)

    root = make_hrem_fixture("/tmp/golden_gen")
    aee = run_cli(root, ckpt, "/tmp/golden_gen/out")
    with open(os.path.join(HERE, "hrem_golden.json"), "w") as f:
        json.dump({"model": "eemflow", "aee": aee, "torch_seed": 1234,
                   "fixture_seed": 99}, f, indent=2)
    print(f"golden AEE = {aee}")


if __name__ == "__main__":
    main()
