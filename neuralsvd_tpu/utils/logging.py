"""CSV metric logging (reference: examples/utils.py:40-45)."""
from __future__ import annotations

import csv
import datetime
import os
from typing import Sequence


class CSVLogger:
    def __init__(self, log_dir: str, fieldnames: Sequence[str],
                 name: str = "log"):
        os.makedirs(log_dir, exist_ok=True)
        stamp = datetime.datetime.now().isoformat(timespec="seconds")
        self.path = os.path.join(log_dir, f"{name}_{stamp}.csv")
        self._file = open(self.path, "w", newline="")
        self._writer = csv.DictWriter(self._file, fieldnames=fieldnames,
                                      extrasaction="ignore")
        self._writer.writeheader()

    def writerow(self, row: dict):
        self._writer.writerow(row)
        self._file.flush()

    def close(self):
        self._file.close()


class MetricsLogger:
    """Append-only JSONL scalar logger (the TPU build's replacement for the
    reference's tensorboardX SummaryWriter, tools/logger.py — no TF
    dependency; one line per event: {"step", "tag", "value"})."""

    def __init__(self, log_dir: str, name: str = "metrics.jsonl"):
        import os
        os.makedirs(log_dir, exist_ok=True)
        self._fh = open(os.path.join(log_dir, name), "a")

    def log(self, step: int, **scalars):
        import json
        for tag, value in scalars.items():
            self._fh.write(json.dumps(
                {"step": int(step), "tag": tag, "value": float(value)}) + "\n")
        self._fh.flush()

    def close(self):
        self._fh.close()
