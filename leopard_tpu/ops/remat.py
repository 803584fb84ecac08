"""Recompute (remat) policies for the layer scans.

≙ the reference's --recompute-granularity {full,selective}
(Megatron-LM-240603/megatron/training/arguments.py; shipped configs use
`full --recompute-method uniform --recompute-num-layers 1`,
examples/llava/train_multiimg_llava_siglip.sh:96-100).

Modes (TrainConfig.remat):
  - "none"      — save every intermediate; fastest, highest memory.
  - "selective" — ≙ Megatron's selective recompute. Saves matmul outputs
    (q/k/v/o projections, MLP GEMMs — cheap to keep, expensive to
    recompute on the MXU) plus the attention output (tagged with
    checkpoint_name so the Pallas flash forward is NOT re-run in the
    backward pass), while elementwise ops / norms / masks are recomputed.
    `dots_with_no_batch_dims_saveable` deliberately excludes batched dots,
    so the dense path's O(S²) score matrices are never saved.
  - "attn"      — save ONLY the attention outputs: the one activation whose
    recompute is a whole flash-kernel forward. Memory cost is a single
    [B, S, H] per layer (vs selective's ~10× that for every GEMM output),
    so it stays feasible at 16k+ sequences where selective does not fit,
    while cutting the dominant recompute out of "full".
  - "full"      — per-layer full recompute: only layer boundaries are
    saved; the entire layer forward re-runs in backward. Lowest memory.
"""

from __future__ import annotations

from typing import Union

import jax
from jax.ad_checkpoint import checkpoint_name

ATTN_OUT = "attn_out"
FLASH_LSE = "flash_lse"


def tag_attn_out(o):
    """Mark the attention output as saveable under the selective policy.

    Identity outside jax.checkpoint; under remat="selective"/"attn" it keeps
    the (Pallas flash / ring / dense) attention forward from re-running in
    the backward pass. NOTE: for a custom_vjp op (the flash kernel) the tag
    must ALSO be applied inside the forward RULE — the rule's residuals are
    what the backward consumes, and a tag on the call-site output does not
    save them (verified by jaxpr: the kernel re-ran in backward until
    _flash_fwd tagged its own out/lse; see flash_attention.py)."""
    return checkpoint_name(o, ATTN_OUT)


def tag_flash_lse(x):
    """Mark the flash kernel's logsumexp residual as saveable (see above)."""
    return checkpoint_name(x, FLASH_LSE)


def remat_wrap(body, mode: Union[bool, str, None]):
    """Wrap a scan body with the requested recompute policy.

    Accepts legacy booleans (True == "full", False == "none") so callers
    that thread a bool through keep working."""
    if not mode or mode == "none":
        return body
    if mode is True or mode == "full":
        return jax.checkpoint(body, prevent_cse=False)
    if mode == "selective":
        policy = jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names(ATTN_OUT, FLASH_LSE),
        )
        return jax.checkpoint(body, policy=policy, prevent_cse=False)
    if mode == "attn":
        policy = jax.checkpoint_policies.save_only_these_names(
            ATTN_OUT, FLASH_LSE
        )
        return jax.checkpoint(body, policy=policy, prevent_cse=False)
    raise ValueError(f"unknown remat mode: {mode!r}")
