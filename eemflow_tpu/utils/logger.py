"""Append-only run logger (reference ``utils/logger.py:6-77``)."""

from __future__ import annotations

import os
from typing import Any, Dict


class Logger:
    def __init__(self, save_path: str, filename: str = "log.txt"):
        os.makedirs(save_path, exist_ok=True)
        self.path = os.path.join(save_path, filename)

    def write_line(self, line: str, verbose: bool = False) -> None:
        with open(self.path, "a") as f:
            f.write(line + "\n")
        if verbose:
            print(line, flush=True)

    def write_dict(self, d: Dict[str, Any], verbose: bool = False) -> None:
        for k, v in d.items():
            self.write_line(f"{k}: {v}", verbose)
