"""Structured logging: text log + tabular CSV, per-worker dirs.

Replaces the reference's rllab-style singleton (utils/logger.py:260-495):
`setup(work_dir)` opens text/CSV outputs, `log(msg)` writes timestamped
lines, `record_tabular(key, val)` + `dump_tabular()` emit aligned CSV rows.
"""
from __future__ import annotations

import csv
import datetime
import os
import sys
from typing import Any, Dict, List, Optional, TextIO


class Logger:
    def __init__(self):
        self._text_files: List[TextIO] = []
        self._tabular_path: Optional[str] = None
        self._tabular_keys: Optional[List[str]] = None
        self._row: Dict[str, Any] = {}
        self._prefix = ""
        self.work_dir: Optional[str] = None
        self._tb = None
        self._tb_step = 0

    def enable_tensorboard(self, logdir: Optional[str] = None) -> bool:
        """Optional TensorBoard scalars (the reference's tensorboardX
        writer, experiments_builder.py:36-37). Uses torch's bundled writer;
        returns False if unavailable."""
        try:
            from torch.utils.tensorboard import SummaryWriter
        except ImportError:
            return False
        self._tb = SummaryWriter(logdir or os.path.join(
            self.work_dir or ".", "tb"))
        return True

    def setup(self, work_dir: str, text_name: str = "debug.log",
              tabular_name: str = "progress.csv") -> None:
        os.makedirs(work_dir, exist_ok=True)
        self.work_dir = work_dir
        self._text_files = [open(os.path.join(work_dir, text_name), "a")]
        self._tabular_path = os.path.join(work_dir, tabular_name)
        self._tabular_keys = None

    def set_prefix(self, prefix: str) -> None:
        self._prefix = prefix

    def log(self, msg: str, stdout: bool = True) -> None:
        ts = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
        line = f"{ts} | {self._prefix}{msg}"
        if stdout:
            print(line, file=sys.stderr)
        for f in self._text_files:
            f.write(line + "\n")
            f.flush()

    def record_tabular(self, key: str, val: Any) -> None:
        self._row[self._prefix + key] = val

    def dump_tabular(self) -> None:
        if self._tb is not None:
            self._tb_step += 1
            for k, v in self._row.items():
                try:
                    self._tb.add_scalar(k, float(v), self._tb_step)
                except (TypeError, ValueError):
                    pass
        if not self._row or self._tabular_path is None:
            self._row = {}
            return
        new_file = not os.path.exists(self._tabular_path) or \
            os.path.getsize(self._tabular_path) == 0
        if self._tabular_keys is None:
            self._tabular_keys = list(self._row.keys())
        with open(self._tabular_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._tabular_keys,
                               extrasaction="ignore")
            if new_file:
                w.writeheader()
            w.writerow(self._row)
        self._row = {}

    def close(self) -> None:
        for f in self._text_files:
            f.close()
        self._text_files = []


logger = Logger()


def setup_logger(work_dir: str, rank: int = 0) -> Logger:
    """Per-worker logger dir (env_wrapper.py:153-159 convention)."""
    d = os.path.join(work_dir, str(rank))
    logger.setup(d)
    return logger
