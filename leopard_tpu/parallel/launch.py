"""Multi-host bootstrap.

Replaces the reference's cluster bootstrap layer (torch.distributed.run +
NCCL/GLOO env blocks, examples/llava/train_multiimg_llava_siglip.sh:4-49 and
megatron/training/initialize.py:243-264): on TPU pods,
`jax.distributed.initialize()` discovers the coordinator from the TPU
metadata (or explicit args), and all collective routing is the mesh's job —
none of the reference's NCCL_IB/UCX tuning has a counterpart because XLA owns
the ICI/DCN transport.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX (no-op on single host). Returns topology info."""
    explicit = coordinator_address is not None
    env_hosts = int(os.environ.get("LEOPARD_NUM_HOSTS", "1"))
    if explicit or env_hosts > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def is_primary() -> bool:
    """Primary host (rank-0 equivalents: logging, checkpoint metadata)."""
    return jax.process_index() == 0


def dp_rank_and_world(mesh_cfg) -> tuple[int, int]:
    """Data-loading shard for this host: one loader shard per process, with
    the (data × fsdp) product as the logical DP world
    (≙ MegatronPretrainingRandomSampler's DP sharding,
    examples/llava/pretrain_megatron_llava.py:200-207)."""
    return jax.process_index(), max(jax.process_count(), 1)
