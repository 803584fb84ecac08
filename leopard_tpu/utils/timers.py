"""Hierarchical timers + metrics logging.

Role parity with the reference's Timers (megatron/core/timers.py:147 — named
phase timers with optional sync, the 23 phases logged at
megatron_patch/training.py:340-364) and training_log (:302-474). On TPU,
device sync is `jax.block_until_ready` on demand rather than barriered CUDA
events; wall-clock numbers are per-host.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Optional


class Timers:
    def __init__(self):
        self._elapsed: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)
        self._start: Dict[str, float] = {}

    @contextmanager
    def __call__(self, name: str, sync_value=None):
        self.start(name)
        try:
            yield
        finally:
            self.stop(name, sync_value)

    def start(self, name: str) -> None:
        self._start[name] = time.perf_counter()

    def stop(self, name: str, sync_value=None) -> None:
        if sync_value is not None:
            import jax

            jax.block_until_ready(sync_value)
        self._elapsed[name] += time.perf_counter() - self._start.pop(name)
        self._count[name] += 1

    def elapsed(self, name: str, reset: bool = False) -> float:
        v = self._elapsed[name]
        if reset:
            self._elapsed[name] = 0.0
            self._count[name] = 0
        return v

    def mean(self, name: str) -> float:
        c = self._count[name]
        return self._elapsed[name] / c if c else 0.0

    def snapshot(self, reset: bool = False) -> Dict[str, float]:
        out = {k: self.mean(k) for k in list(self._elapsed)}
        if reset:
            self._elapsed.clear()
            self._count.clear()
        return out


class MetricsLogger:
    """JSONL metrics stream + optional tensorboard scalars.

    (≙ tensorboard writes in training_log, megatron_patch/training.py:375-428;
    jsonl is the primary sink so logs survive without TB installed.)"""

    def __init__(self, log_dir: str, tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        row = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        self._fh.write(json.dumps(row) + "\n")
        self._fh.flush()
        if self._tb is not None:
            for k, v in row.items():
                if isinstance(v, float) and k not in ("time",):
                    self._tb.add_scalar(k, v, step)

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


class StepTimeTracker:
    """Per-host step-time min/max/mean reporting over a window — the
    straggler-detection signal (≙ StragglerDetector,
    Megatron-LM-240603/megatron/core/utils.py:514; on TPU there is no per-rank
    kernel timing, so wall-clock step time + device sync time per host is the
    equivalent observable)."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times: list[float] = []

    def record(self, seconds: float) -> None:
        self.times.append(seconds)
        if len(self.times) > self.window:
            self.times.pop(0)

    def report(self) -> Dict[str, float]:
        if not self.times:
            return {}
        import statistics

        return {
            "step_time_mean": statistics.mean(self.times),
            "step_time_min": min(self.times),
            "step_time_max": max(self.times),
            "step_time_p50": statistics.median(self.times),
        }
