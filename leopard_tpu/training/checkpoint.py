"""Distributed checkpointing: async, sharded, with data-position state.

Replaces both reference systems (SURVEY.md §5): the legacy rank-sharded torch
checkpoints (megatron/training/checkpointing.py:272,675 —
iter_XXXXXXX/mp_rank_XX layout + latest_checkpointed_iteration.txt) and the
dist_checkpointing library (megatron/core/dist_checkpointing/ with async save
finalized at megatron_patch/training.py:562). Built on Orbax:

  - sharded save/restore follows each array's NamedSharding (works for any
    mesh re-slice — no mp_rank_XX directory surgery on TP/PP changes)
  - async save (save returns immediately; finalize before the next save)
  - data-position state (step, sample offset, shard cursor, rng) is saved
    WITH the model, fixing the reference's documented mid-epoch-resume gap
    (examples/idefics2/idefics2.md:12-50)
  - retention: keep latest N checkpoints
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

LATEST_FILE = "latest_checkpointed_iteration.txt"


class CheckpointManager:
    """step-indexed checkpoints of {state, data_state, config}."""

    def __init__(self, directory: str, max_to_keep: int = 3, async_save: bool = True):
        if not _HAS_ORBAX:
            raise RuntimeError("orbax-checkpoint is required")
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, data_state: Optional[dict] = None,
             config: Optional[dict] = None) -> None:
        args = {"state": ocp.args.StandardSave(state)}
        if data_state is not None:
            args["data_state"] = ocp.args.JsonSave(data_state)
        if config is not None:
            args["config"] = ocp.args.JsonSave(config)
        self._mgr.save(step, args=ocp.args.Composite(**args))
        with open(os.path.join(self.directory, LATEST_FILE), "w") as f:
            f.write(str(step))

    def restore(self, step: Optional[int] = None, template: Any = None):
        """Returns (state, data_state|None). `template` is an abstract or
        concrete pytree with the desired shardings/dtypes."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None, None
        args = {"state": ocp.args.StandardRestore(template)}
        names = self._item_names(step)
        if "data_state" in names:
            args["data_state"] = ocp.args.JsonRestore()
        restored = self._mgr.restore(step, args=ocp.args.Composite(**args))
        return restored["state"], restored.get("data_state")

    def _item_names(self, step: int):
        d = os.path.join(self.directory, str(step))
        return set(os.listdir(d)) if os.path.isdir(d) else set()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait_until_finished(self) -> None:
        """Finalize pending async saves (≙ maybe_finalize_async_save,
        megatron_patch/training.py:562)."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def abstract_like(tree: Any) -> Any:
    """Abstract pytree (ShapeDtypeStruct with shardings) for restore-time
    placement, from a concrete state."""
    def leaf(x):
        if hasattr(x, "shape"):
            sharding = getattr(x, "sharding", None)
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        return x

    return jax.tree_util.tree_map(leaf, tree)
