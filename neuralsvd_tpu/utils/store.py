"""Experiment store: per-run artifact directories, queryable run readers.

Reference: tools/store/writer.py + tools/store/reader.py (the slurm-era
experiment manager: args.pkl, named csv data-dicts, ``latest_*`` checkpoint
convention, resume-killed scanning).  JSON replaces pickle for args (safer,
diffable); checkpoints delegate to training/checkpoint.py.
"""
from __future__ import annotations

import csv
import glob
import json
import os
from typing import Any, Dict, List, Optional


class ExperimentLogWriter:
    """Owns one run directory: args.json, csv data-dicts, checkpoints."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._csv: Dict[str, csv.DictWriter] = {}
        self._files: Dict[str, Any] = {}

    def save_args(self, args: Any):
        data = vars(args) if hasattr(args, "__dict__") else dict(args)
        with open(os.path.join(self.log_dir, "args.json"), "w") as fh:
            json.dump({k: repr(v) if not _jsonable(v) else v
                       for k, v in data.items()}, fh, indent=2)

    def init_data_dict(self, name: str, fieldnames: List[str]):
        path = os.path.join(self.log_dir, f"{name}.csv")
        fh = open(path, "a", newline="")
        writer = csv.DictWriter(fh, fieldnames=fieldnames,
                                extrasaction="ignore")
        if fh.tell() == 0:
            writer.writeheader()
        self._csv[name] = writer
        self._files[name] = fh

    def append(self, name: str, row: dict):
        self._csv[name].writerow(row)
        self._files[name].flush()

    def save_checkpoint(self, state, step: int, tag: str = "ckpt"):
        from neuralsvd_tpu.training.checkpoint import save_checkpoint

        path = os.path.join(self.log_dir, f"{tag}_{step}")
        save_checkpoint(path, state)
        # maintain the latest_* convention for resume scans
        marker = os.path.join(self.log_dir, f"latest_{tag}")
        with open(marker, "w") as fh:
            fh.write(str(step))
        return path

    def close(self):
        for fh in self._files.values():
            fh.close()


class RunReader:
    """Read one run directory: args + csv frames + latest checkpoint."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    @property
    def args(self) -> dict:
        path = os.path.join(self.log_dir, "args.json")
        if not os.path.exists(path):
            return {}
        with open(path) as fh:
            return json.load(fh)

    def data(self, name: str) -> List[dict]:
        path = os.path.join(self.log_dir, f"{name}.csv")
        if not os.path.exists(path):
            return []
        with open(path) as fh:
            return list(csv.DictReader(fh))

    def latest_step(self, tag: str = "ckpt") -> Optional[int]:
        marker = os.path.join(self.log_dir, f"latest_{tag}")
        if not os.path.exists(marker):
            return None
        with open(marker) as fh:
            return int(fh.read().strip())

    def load_latest(self, tag: str = "ckpt", target=None):
        from neuralsvd_tpu.training.checkpoint import load_checkpoint

        step = self.latest_step(tag)
        if step is None:
            return None, None
        return load_checkpoint(
            os.path.join(self.log_dir, f"{tag}_{step}"), target), step


class ExperimentLogReader:
    """Query/sort runs under a root directory (reader.py equivalent)."""

    def __init__(self, root: str):
        self.root = root

    def runs(self, pattern: str = "*") -> List[RunReader]:
        dirs = sorted(
            d for d in glob.glob(os.path.join(self.root, pattern))
            if os.path.isdir(d))
        return [RunReader(d) for d in dirs]

    def resume_killed(self, tag: str = "ckpt") -> List[RunReader]:
        """Runs with a latest checkpoint but no 'done' marker — candidates
        for resumption (reference: store/reader.py:37-46)."""
        out = []
        for run in self.runs():
            if run.latest_step(tag) is not None and not os.path.exists(
                    os.path.join(run.log_dir, "done")):
                out.append(run)
        return out


def mark_done(log_dir: str):
    with open(os.path.join(log_dir, "done"), "w") as fh:
        fh.write("done")


def _jsonable(v) -> bool:
    try:
        json.dumps(v)
        return True
    except (TypeError, ValueError):
        return False
