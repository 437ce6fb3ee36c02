"""Observability: rank-0 console/file logging, tensorboard scalars,
profiler traces.

Covers the reference's logging surface (train_utils.py:428-432 rich console
+ log file; :919-937 tensorboardX scalars/histograms) and adds what it
lacks (SURVEY.md §5.1): jax.profiler trace capture and explicit rays/sec /
points/sec counters.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Any, Dict, Optional

import numpy as np


class RunLogger:
    """Console + ``log_ngp.txt`` + optional tensorboard."""

    def __init__(self, workspace: str, use_tensorboard: bool = True,
                 is_main_process: bool = True):
        self.workspace = workspace
        self.is_main = is_main_process
        self.log_path = os.path.join(workspace, "log_ngp.txt")
        os.makedirs(workspace, exist_ok=True)
        self.writer = None
        if use_tensorboard and is_main_process:
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(
                    os.path.join(workspace, "run"))
            except Exception:
                self.writer = None

    def log(self, *args):
        if not self.is_main:
            return
        msg = " ".join(str(a) for a in args)
        print(msg)
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")

    def scalar(self, tag: str, value: float, step: int):
        if self.writer is not None:
            self.writer.add_scalar(tag, float(value), step)

    def scalars(self, values: Dict[str, float], step: int,
                prefix: str = "train"):
        for k, v in values.items():
            try:
                self.scalar(f"{prefix}/{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def histogram(self, tag: str, values, step: int):
        if self.writer is not None:
            self.writer.add_histogram(tag, np.asarray(values), step)

    def close(self):
        if self.writer is not None:
            self.writer.close()


class ThroughputMeter:
    """rays/sec and points/sec counters (the reference only surfaces tqdm
    it/s, SURVEY.md §5.1)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.time()
        self.rays = 0
        self.points = 0
        self.steps = 0

    def update(self, num_rays: int, num_points: int = 0):
        self.rays += num_rays
        self.points += num_points
        self.steps += 1

    def rates(self) -> Dict[str, float]:
        dt = max(time.time() - self.t0, 1e-9)
        return {"rays_per_sec": self.rays / dt,
                "points_per_sec": self.points / dt,
                "steps_per_sec": self.steps / dt}


@contextlib.contextmanager
def profiler_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace capture viewable in TensorBoard/Perfetto."""
    if not enabled:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    try:
        jax.profiler.start_trace(log_dir)
        yield
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass
