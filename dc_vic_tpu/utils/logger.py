"""Logging sinks: console/file logger, CSV logger, windowed average meter.

Mirrors the reference's three observability sinks (ref: src/utils/logger.py):
console+file logger, CSVLogger (append + resume-append), AvgMeter.
"""
from __future__ import annotations

import csv
import logging
import os
import sys
from collections import defaultdict
from typing import Dict, List, Optional

_LOGGER_NAME = "dc_vic_tpu"
_initialized = False


def get_root_logger(log_file: Optional[str] = None, level: int = logging.INFO) -> logging.Logger:
    global _initialized
    logger = logging.getLogger(_LOGGER_NAME)
    if not _initialized:
        logger.setLevel(level)
        fmt = logging.Formatter("%(asctime)s [%(levelname)s] %(message)s", "%H:%M:%S")
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        logger.propagate = False
        _initialized = True
    if log_file is not None and not any(
        isinstance(h, logging.FileHandler) and h.baseFilename == os.path.abspath(log_file)
        for h in logger.handlers
    ):
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter("%(asctime)s [%(levelname)s] %(message)s"))
        logger.addHandler(fh)
    return logger


def bolded_log(msg: str, level: str = "info", new_line: bool = True) -> None:
    logger = get_root_logger()
    bar = "=" * max(24, len(msg))
    if new_line:
        getattr(logger, level)("")
    getattr(logger, level)(bar)
    getattr(logger, level)(msg)
    getattr(logger, level)(bar)


def log_dict_items(d: Dict, level: str = "info", indent: bool = False) -> None:
    logger = get_root_logger()
    pad = "    " if indent else ""
    for k, v in d.items():
        getattr(logger, level.lower())(f"{pad}{k}: {v}")


class AvgMeter:
    """Windowed running average of named scalars (reset on read)."""

    def __init__(self):
        self._sum: Dict[str, float] = defaultdict(float)
        self._cnt: Dict[str, int] = defaultdict(int)

    def update(self, values: Dict[str, float]) -> None:
        for k, v in values.items():
            self._sum[k] += float(v)
            self._cnt[k] += 1

    def pop(self) -> Dict[str, float]:
        out = {k: self._sum[k] / max(1, self._cnt[k]) for k in self._sum}
        self._sum.clear()
        self._cnt.clear()
        return out


class CSVLogger:
    """Append-only CSV logger; resume-appends to an existing file with the
    same schema (ref: src/utils/logger.py:33-66)."""

    def __init__(self, path: str, fieldnames: List[str]):
        self.path = path
        self.fieldnames = list(fieldnames)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        new_file = not os.path.exists(path) or os.path.getsize(path) == 0
        if new_file:
            with open(path, "w", newline="") as f:
                csv.DictWriter(f, fieldnames=self.fieldnames).writeheader()
        else:
            with open(path, newline="") as f:
                header = next(csv.reader(f), None)
            if header and header != self.fieldnames:
                self.fieldnames = header  # keep the on-disk schema

    def write(self, row: Dict) -> None:
        with open(self.path, "a", newline="") as f:
            csv.DictWriter(f, fieldnames=self.fieldnames, extrasaction="ignore").writerow(row)
