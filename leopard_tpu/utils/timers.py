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
    equivalent observable). Like the reference, reporting can be toggled at
    runtime over a TCP port (core/README_STRAGGLER.md): connect and send
    "on"/"off"/"status"."""

    def __init__(self, window: int = 100, toggle_port: Optional[int] = None):
        self.window = window
        self.times: list[float] = []
        self.enabled = True
        self._server = None
        if toggle_port is not None:
            self._start_toggle_server(toggle_port)

    def record(self, seconds: float) -> None:
        if not self.enabled:
            return
        self.times.append(seconds)
        if len(self.times) > self.window:
            self.times.pop(0)

    def report(self) -> Dict[str, float]:
        if not self.times or not self.enabled:
            return {}
        import statistics

        return {
            "step_time_mean": statistics.mean(self.times),
            "step_time_min": min(self.times),
            "step_time_max": max(self.times),
            "step_time_p50": statistics.median(self.times),
        }

    def _start_toggle_server(self, port: int) -> None:
        import socket
        import threading

        def serve():
            srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            srv.bind(("127.0.0.1", port))
            srv.listen(4)
            self._server = srv
            while True:
                conn, _ = srv.accept()
                with conn:
                    cmd = conn.recv(64).decode().strip().lower()
                    if cmd == "on":
                        self.enabled = True
                    elif cmd == "off":
                        self.enabled = False
                        self.times.clear()
                    conn.sendall(
                        f"straggler-tracking {'on' if self.enabled else 'off'}\n".encode()
                    )

        threading.Thread(target=serve, daemon=True).start()
