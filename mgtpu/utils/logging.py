"""Run-dir loggers — rebuild of optim.Logger usage: train.log /
test.log / eval.log accumulate one row per epoch
(`pipelines/standard/train.lua:34,106`)."""

from __future__ import annotations

import os
import time
from typing import Dict


class EpochLogger:
    """Appends tab-separated rows with a header, optim.Logger-style."""

    def __init__(self, path: str):
        self.path = path
        self._names = None
        self._warned = False
        os.makedirs(os.path.dirname(path), exist_ok=True)

    def add(self, row: Dict[str, float]):
        if self._names is None:
            self._names = sorted(row)
            if not os.path.exists(self.path) or os.path.getsize(self.path) == 0:
                with open(self.path, "a") as f:
                    f.write("\t".join(self._names) + "\n")
        elif sorted(row) != self._names and not self._warned:
            # columns are frozen by the first row; a changed key set
            # would silently land values under the wrong header
            print(f"WARNING: {self.path}: metric keys changed "
                  f"({sorted(row)} vs header {self._names}); writing "
                  "nan for missing columns and dropping extras")
            self._warned = True
        with open(self.path, "a") as f:
            f.write("\t".join(f"{row.get(n, float('nan')):.6f}"
                              for n in self._names) + "\n")


def now() -> str:
    return time.strftime("%x %X")


def fmt_metrics(metrics: Dict[str, float], prefix: str = "") -> str:
    return " ".join(f"{prefix}{k}:{v:.5f}" for k, v in metrics.items())
