"""Structured metrics logging + step timing + profiler hooks.

The reference logs with bare prints and writes artifact CSVs/PNGs scattered
through scripts (SURVEY.md §5 'Metrics / logging'). Here: a MetricLogger that
keeps per-step dicts, prints the reference-style epoch breakdowns, writes
CSV/JSONL artifacts, and exposes jax.profiler tracing around hot loops
(SURVEY.md §5 'Tracing / profiling — ABSENT' -> added)."""

from __future__ import annotations

import contextlib
import csv
import json
import os
import time
from typing import Any, Dict, Iterable, List, Optional

import numpy as np


class MetricLogger:
    def __init__(self, run_dir: Optional[str] = None, print_every: int = 1):
        self.run_dir = run_dir
        self.print_every = print_every
        self.history: List[Dict[str, float]] = []
        self._jsonl = None
        if run_dir:
            os.makedirs(run_dir, exist_ok=True)
            self._jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")

    @staticmethod
    def _scalarize(metrics: Dict[str, Any]) -> Dict[str, float]:
        out = {}
        for k, v in metrics.items():
            arr = np.asarray(v)
            out[k] = float(arr) if arr.ndim == 0 else arr.tolist()
        return out

    def log(self, step: int, metrics: Dict[str, Any], prefix: str = "") -> Dict:
        rec = {"step": step, **{prefix + k: v for k, v in self._scalarize(metrics).items()}}
        self.history.append(rec)
        if self._jsonl:
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        return rec

    def print_epoch(self, epoch: int, metrics: Dict[str, Any]):
        """Reference-style per-epoch loss breakdown line
        (ref vessel train.py:93-97, mnist train.py:95)."""
        if (epoch + 1) % self.print_every:
            return
        parts = ", ".join(
            f"{k}: {float(np.asarray(v)):.4f}"
            for k, v in metrics.items()
            if np.asarray(v).ndim == 0
        )
        print(f"Epoch {epoch + 1}: {parts}", flush=True)

    def close(self):
        if self._jsonl:
            self._jsonl.close()


class StepTimer:
    """Wall-clock per-step timing with warmup exclusion; reports images/sec."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._count = 0
        self._start: Optional[float] = None
        self.images = 0

    def tick(self, batch_size: int):
        self._count += 1
        if self._count == self.warmup + 1:
            self._start = time.perf_counter()
            self.images = 0
        if self._count > self.warmup:
            self.images += batch_size

    @property
    def images_per_sec(self) -> float:
        if self._start is None or self.images == 0:
            return 0.0
        return self.images / (time.perf_counter() - self._start)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace around a block; no-op when log_dir is None.
    View with TensorBoard or xprof."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def write_csv(path: str, rows: Iterable[Dict[str, Any]], fieldnames=None):
    """Artifact CSV writer preserving the reference's file contracts
    (all_pairwise_report.csv etc. — SURVEY.md §3.4)."""
    rows = list(rows)
    if not rows:
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fieldnames = fieldnames or list(rows[0].keys())
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames)
        w.writeheader()
        for r in rows:
            w.writerow(r)


def write_matrix_csv(path: str, matrix: np.ndarray, row_names, col_names,
                     corner: str = ""):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([corner] + list(col_names))
        for name, row in zip(row_names, np.asarray(matrix)):
            w.writerow([name] + [f"{v:.6g}" for v in row])
