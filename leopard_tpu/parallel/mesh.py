"""Device-mesh construction and axis conventions.

TPU-native replacement for the reference's process-group bootstrap
(Megatron-LM-240603/megatron/core/parallel_state.py:300 builds TP/PP/CP/EP/DP
NCCL groups). Here a single `jax.sharding.Mesh` carries all parallel axes and
XLA emits the collectives; the axis order is chosen so the innermost axes
("seq", "model") map to the fastest ICI links and "data" spans DCN when
multi-slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from leopard_tpu.config import MeshConfig

# Canonical axis names, outermost → innermost.
DATA_AXIS = "data"
STAGE_AXIS = "stage"
FSDP_AXIS = "fsdp"
EXPERT_AXIS = "expert"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"
AXIS_ORDER = (DATA_AXIS, STAGE_AXIS, FSDP_AXIS, EXPERT_AXIS, SEQ_AXIS, MODEL_AXIS)


def build_mesh(cfg: MeshConfig, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a Mesh with the canonical leopard axes.

    Axis sizes must multiply to the device count. Size-1 axes are kept in the
    mesh (they cost nothing) so PartitionSpecs can always reference them.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    want = cfg.num_devices
    if want != n:
        raise ValueError(
            f"mesh {dict(zip(cfg.axis_names, cfg.shape))} wants {want} devices, "
            f"have {n}"
        )
    dev_array = np.asarray(devices).reshape(cfg.shape)
    return Mesh(dev_array, cfg.axis_names)


def single_device_mesh() -> Mesh:
    return build_mesh(MeshConfig(), devices=jax.devices()[:1])


def auto_mesh(model: int = 1, seq: int = 1, fsdp: int = 1, expert: int = 1,
              stage: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh with explicit inner axes; remaining devices become pure DP."""
    if devices is None:
        devices = jax.devices()
    inner = model * seq * fsdp * expert * stage
    if len(devices) % inner != 0:
        raise ValueError(f"{len(devices)} devices not divisible by {inner}")
    cfg = MeshConfig(data=len(devices) // inner, stage=stage, fsdp=fsdp,
                     expert=expert, seq=seq, model=model)
    return build_mesh(cfg, devices)


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
