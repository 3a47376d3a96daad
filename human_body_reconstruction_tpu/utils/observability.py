"""Observability: structured metrics, profiling traces, debug checks.

Replaces the reference's ad-hoc apparatus (SURVEY.md section 5): dead
``time.time()`` brackets (train_hash2.py:198-246), pervasive shape
prints, matplotlib gradient bar charts (helper.py:239-266) and
``torch.autograd.set_detect_anomaly`` (test_hash.py:178) with:

  * ``MetricsLogger`` — per-step records to stdout and CSV/JSONL,
  * ``profile_trace`` — a context manager around ``jax.profiler`` so any
    training window can be captured for TensorBoard/xprof,
  * ``enable_debug_checks`` — jax_debug_nans/jax_disable_jit toggles (the
    TPU-world anomaly detector),
  * ``grad_norms`` — per-group gradient norms (the useful core of
    plot_grad_flow, logged instead of plotted).
"""

from __future__ import annotations

import contextlib
import csv
import json
import os
import time
from typing import Optional

import jax


class MetricsLogger:
    """Append-only metrics sink: stdout + optional CSV + JSONL."""

    def __init__(self, out_dir: Optional[str] = None, name: str = "metrics",
                 stdout: bool = True):
        self.stdout = stdout
        self.csv_path = None
        self.jsonl_path = None
        self._csv_file = None
        self._csv_writer = None
        self._fields = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self.csv_path = os.path.join(out_dir, f"{name}.csv")
            self.jsonl_path = os.path.join(out_dir, f"{name}.jsonl")

    def log(self, record: dict):
        record = {k: (float(v) if hasattr(v, "item") else v)
                  for k, v in record.items()}
        record.setdefault("time", time.time())
        if self.stdout:
            msg = "  ".join(f"{k}={v:.5g}" if isinstance(v, float)
                            else f"{k}={v}" for k, v in record.items()
                            if k != "time")
            print(msg, flush=True)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(record) + "\n")
        if self.csv_path:
            if self._csv_writer is None:
                self._fields = list(record.keys())
                exists = os.path.exists(self.csv_path)
                self._csv_file = open(self.csv_path, "a", newline="")
                self._csv_writer = csv.DictWriter(self._csv_file,
                                                  fieldnames=self._fields)
                if not exists:
                    self._csv_writer.writeheader()
            row = {k: record.get(k, "") for k in self._fields}
            self._csv_writer.writerow(row)
            self._csv_file.flush()

    def close(self):
        if self._csv_file:
            self._csv_file.close()
            self._csv_file = None
            self._csv_writer = None


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace for the enclosed block.

    View with TensorBoard (or xprof) pointed at ``log_dir``.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def enable_debug_checks(nans: bool = True, disable_jit: bool = False):
    """TPU-world equivalent of torch anomaly detection."""
    jax.config.update("jax_debug_nans", nans)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)


def grad_norms(grads) -> dict:
    """Per-top-level-group global-norm of a gradient pytree."""
    out = {}
    for key, sub in grads.items():
        leaves = jax.tree_util.tree_leaves(sub)
        total = sum(jax.numpy.sum(l.astype(jax.numpy.float32) ** 2)
                    for l in leaves)
        out[f"grad_norm/{key}"] = jax.numpy.sqrt(total)
    return out
