"""The training loop: orchestration, observability, failure handling.

Role parity with megatron_patch/training.py:486-795 (`train`, `training_log`,
`evaluate`) — step loop with timers, metrics logging, eval/save intervals,
SIGTERM checkpoint-and-exit, exit-on-duration, NaN accounting, param-hash
verification across data-parallel replicas, and profiler windows
(jax.profiler trace ≙ the reference's cudaProfilerStart/emit_nvtx windows,
megatron_patch/training.py:555-560).
"""

from __future__ import annotations

import hashlib
import signal
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from leopard_tpu.config import TrainConfig, VLMConfig
from leopard_tpu.data.dataset import DataState
from leopard_tpu.training.checkpoint import CheckpointManager
from leopard_tpu.training.trainer import TrainState
from leopard_tpu.utils.timers import MetricsLogger, StepTimeTracker, Timers


class SignalState:
    """SIGTERM → checkpoint-and-exit (≙ dist_signal_handler.py + the handler
    at megatron_patch/training.py:630-636)."""

    def __init__(self):
        self.triggered = False

    def install(self):
        def handler(signum, frame):
            self.triggered = True

        signal.signal(signal.SIGTERM, handler)
        return self


class BatchRamp:
    """Global-batch-size ramp-up schedule.

    ≙ Megatron's --rampup-batch-size and update_num_microbatches
    (megatron/core/num_microbatches_calculator; invoked per step at
    megatron_patch/training.py:564-575): batch size starts at `start` and
    grows by `increment` at equal sample intervals until it reaches
    `global_batch_size` after `ramp_samples` consumed samples."""

    def __init__(self, start: int, increment: int, ramp_samples: int,
                 global_batch_size: int):
        assert increment > 0 and start <= global_batch_size
        assert (global_batch_size - start) % increment == 0, (
            "ramp span must be a multiple of the increment")
        self.start = start
        self.increment = increment
        self.global_batch_size = global_batch_size
        n_steps = (global_batch_size - start) // increment
        # samples consumed at each intermediate size (Megatron divides the
        # ramp samples evenly across increments)
        self.samples_per_increment = (
            ramp_samples // n_steps if n_steps else ramp_samples
        )

    def batch_size(self, consumed_samples: int) -> int:
        if self.samples_per_increment <= 0:
            return self.global_batch_size
        steps = consumed_samples // self.samples_per_increment
        return min(self.global_batch_size, self.start + steps * self.increment)

    def consumed_samples_at(self, step: int) -> int:
        """Samples consumed after `step` ramped steps — exact replay of the
        schedule, so a checkpoint resume continues the ramp where it left
        off instead of silently restarting from the smallest batch
        (≙ Megatron restoring consumed samples from the checkpoint)."""
        consumed = 0
        for _ in range(step):
            consumed += self.batch_size(consumed)
        return consumed


def param_hash(params) -> str:
    """Deterministic hash of all parameters (host transfer; use sparingly).
    ≙ check_param_hashes_across_dp_replicas (megatron_patch/training.py:602) —
    under jit+SPMD, DP replicas share one logical array, so a changed hash
    across hosts indicates corruption rather than desync."""
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(params):
        h.update(np.asarray(jax.device_get(leaf)).tobytes())
    return h.hexdigest()


def train(
    cfg: VLMConfig,
    train_cfg: TrainConfig,
    state: TrainState,
    step_fn: Callable,                      # jitted train_step(state, batch)
    batches: Iterable,                      # yields dict batches (device-ready)
    data_state: Optional[DataState] = None,
    ckpt: Optional[CheckpointManager] = None,
    logger: Optional[MetricsLogger] = None,
    eval_fn: Optional[Callable[[TrainState], dict]] = None,
    profile_steps: Optional[tuple[int, int]] = None,
    profile_dir: str = "/tmp/leopard_profile",
) -> TrainState:
    timers = Timers()
    tracker = StepTimeTracker()
    signals = SignalState().install()
    start_time = time.time()
    nan_iters = 0
    ramp = None
    if train_cfg.rampup_batch_size is not None:
        # batch-size ramp needs a size-aware provider; a plain iterable can't
        # resize its batches (≙ the reference's rampup consistency check)
        assert callable(batches), (
            "rampup_batch_size requires `batches` to be a callable "
            "batch_size -> batch"
        )
        ramp = BatchRamp(*train_cfg.rampup_batch_size,
                         global_batch_size=train_cfg.global_batch_size)
    if not callable(batches):
        batches = iter(batches).__next__
        fetch = lambda bs: batches()  # noqa: E731
    else:
        fetch = batches

    step = int(state.step)
    # resume-correct sample accounting (a fresh run starts at 0 either way)
    consumed_samples = (
        ramp.consumed_samples_at(step) if ramp
        else step * train_cfg.global_batch_size
    )
    while step < train_cfg.train_steps:
        if profile_steps and step == profile_steps[0]:
            jax.profiler.start_trace(profile_dir)

        cur_bs = (
            ramp.batch_size(consumed_samples) if ramp
            else train_cfg.global_batch_size
        )
        with timers("data"):
            batch = fetch(cur_bs)
            if hasattr(batch, "as_dict"):
                batch = batch.as_dict()
        consumed_samples += cur_bs

        t0 = time.perf_counter()
        with timers("step"):
            state, metrics = step_fn(state, batch)
            jax.block_until_ready(metrics["loss"])
        step_time = time.perf_counter() - t0
        tracker.record(step_time)
        step = int(state.step)

        if profile_steps and step == profile_steps[1]:
            jax.profiler.stop_trace()

        if bool(metrics.get("nan_step", False)):
            nan_iters += 1

        if logger and step % train_cfg.log_interval == 0:
            row = {
                "loss": metrics["loss"],
                "grad_norm": metrics["grad_norm"],
                "tokens_in_loss": metrics["tokens_in_loss"],
                "step_time": step_time,
                "data_time": timers.elapsed("data", reset=True),
                "nan_iters": nan_iters,
                "batch_size": cur_bs,
                "consumed_samples": consumed_samples,
            }
            row.update(tracker.report())
            logger.log(step, row)

        if (
            train_cfg.check_param_hash_interval
            and step % train_cfg.check_param_hash_interval == 0
        ):
            if logger:
                logger.log(step, {"param_hash": param_hash(state.params)})

        if eval_fn and train_cfg.eval_interval and step % train_cfg.eval_interval == 0:
            eval_metrics = eval_fn(state)
            if logger and eval_metrics:
                logger.log(step, {f"eval/{k}": v for k, v in eval_metrics.items()})

        should_save = (
            ckpt is not None
            and train_cfg.save_interval
            and step % train_cfg.save_interval == 0
        )
        exit_now = signals.triggered or (
            train_cfg.exit_duration_mins
            and (time.time() - start_time) / 60 > train_cfg.exit_duration_mins
        )
        if ckpt is not None and (should_save or exit_now):
            ckpt.save(
                step, state,
                data_state=data_state.to_dict() if data_state else None,
            )
        if exit_now:
            if ckpt is not None:
                ckpt.wait_until_finished()
            break

    if ckpt is not None:
        ckpt.wait_until_finished()
    return state


def evaluate_loss(
    state: TrainState,
    loss_fn: Callable,                # jitted (params, batch) → (loss, aux)
    batches: Iterable,
    max_batches: int = 50,
) -> dict:
    """Validation loss + perplexity (≙ evaluate_and_print_results,
    megatron_patch/training.py:757-795)."""
    losses = []
    for i, batch in enumerate(batches):
        if i >= max_batches:
            break
        if hasattr(batch, "as_dict"):
            batch = batch.as_dict()
        loss, _ = loss_fn(state.params, batch)
        losses.append(float(loss))
    if not losses:
        return {}
    mean = float(np.mean(losses))
    return {"loss": mean, "ppl": float(np.exp(min(mean, 20.0)))}
