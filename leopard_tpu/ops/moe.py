"""Mixture-of-Experts layer: top-k router + capacity-based dispatch (EP).

TPU-native replacement for the reference's MoE stack — TopKRouter with
aux-loss / z-loss (megatron/core/transformer/moe/router.py:92), the
all-gather / all-to-all token dispatchers (moe/token_dispatcher.py:57,282),
and MegaBlocks' CUDA routing primitives (megablocks/csrc/: sort, histogram,
cumsum, indices). On TPU the dispatch is expressed as one-hot combine/
dispatch einsums (GShard-style): position-in-expert comes from a cumsum over
the routing mask (≙ csrc cumsum/histogram), tokens beyond expert capacity are
dropped, and XLA turns the einsums into MXU matmuls + all-to-alls when the
expert dim is sharded over the "expert" mesh axis (P("expert", ...) rules in
parallel/sharding.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MoEConfig:
    num_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 1.25
    # dropless (MegaBlocks dMoE semantics): sort-based ragged dispatch with
    # grouped GEMMs — no token is ever dropped, O(T·k) memory
    dropless: bool = False
    aux_loss_coef: float = 1e-2
    z_loss_coef: float = 1e-3
    intermediate_size: int = 14336
    hidden_size: int = 4096
    dtype: str = "bfloat16"


def init_params(cfg: MoEConfig, key: jax.Array) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h, f, e = cfg.hidden_size, cfg.intermediate_size, cfg.num_experts
    dt = jnp.dtype(cfg.dtype)

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) * fan_in**-0.5).astype(dt)

    return {
        "router": {"w": dense(k1, (h, e), h).astype(jnp.float32)},
        "experts": {
            "w_gate": dense(k2, (e, h, f), h),
            "w_up": dense(k3, (e, h, f), h),
            "w_down": dense(k4, (e, f, h), f),
        },
    }


def router_top_k(
    logits: jnp.ndarray,  # [T, E] fp32
    top_k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (probs over selected experts [T, k], expert ids [T, k]).
    Softmax over all experts, then take top-k (TopKRouter semantics)."""
    probs = jax.nn.softmax(logits, axis=-1)
    top_p, top_i = jax.lax.top_k(probs, top_k)
    return top_p, top_i


def load_balancing_loss(probs: jnp.ndarray, expert_ids: jnp.ndarray, num_experts: int):
    """Switch-style aux loss: num_experts · Σ_e fraction_tokens_e · mean_prob_e
    (router.py aux_loss)."""
    t = probs.shape[0]
    onehot = jax.nn.one_hot(expert_ids, num_experts)  # [T, k, E]
    tokens_per_expert = onehot.sum(axis=(0, 1)) / (t * expert_ids.shape[1])
    # mean selected-prob per expert (matches Megatron's aux loss computed
    # over top-k probabilities, router.py apply_load_balancing_loss)
    prob_per_expert = (onehot * probs[..., None]).sum(axis=(0, 1)) / t
    return num_experts * jnp.sum(tokens_per_expert * prob_per_expert)


def z_loss(logits: jnp.ndarray):
    return jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)


def _dropless_dispatch(params: dict, xt: jnp.ndarray, top_p, top_i, k: int, e: int):
    """MegaBlocks-dMoE-style dropless dispatch: stable-sort the T·k routed
    assignments by expert id (≙ csrc sort/histogram/indices,
    megablocks/csrc/ops.cu:12-18), run the three expert matmuls as grouped
    GEMMs over the sorted rows (`jax.lax.ragged_dot`, the TPU analogue of
    MegaBlocks' blocked-sparse SDD/DSD), and scatter-add the gated outputs
    back. O(T·k) memory, zero drops."""
    t, h = xt.shape
    tk = t * k
    e_flat = top_i.reshape(tk).astype(jnp.int32)
    sort_eid, sort_idx = jax.lax.sort_key_val(
        e_flat, jnp.arange(tk, dtype=jnp.int32)
    )
    tok_idx = sort_idx // k                                    # source token/row
    x_sorted = jnp.take(xt, tok_idx, axis=0)                   # [T·k, H]
    group_sizes = jnp.bincount(e_flat, length=e).astype(jnp.int32)

    we = params["experts"]
    gated = jax.nn.silu(
        jax.lax.ragged_dot(x_sorted, we["w_gate"], group_sizes)
    ) * jax.lax.ragged_dot(x_sorted, we["w_up"], group_sizes)
    y_sorted = jax.lax.ragged_dot(gated, we["w_down"], group_sizes)  # [T·k, H]

    gates = jnp.take(top_p.reshape(tk), sort_idx).astype(y_sorted.dtype)
    out = jnp.zeros((t, h), y_sorted.dtype)
    return out.at[tok_idx].add(y_sorted * gates[:, None])


def moe_layer(
    params: dict,
    cfg: MoEConfig,
    x: jnp.ndarray,  # [B, S, H]
) -> Tuple[jnp.ndarray, dict]:
    """Returns (output [B, S, H], {aux_loss, z_loss, fraction_dropped})."""
    b, s, h = x.shape
    t = b * s
    e, k = cfg.num_experts, cfg.top_k
    xt = x.reshape(t, h)

    logits = xt.astype(jnp.float32) @ params["router"]["w"]   # [T, E]
    top_p, top_i = router_top_k(logits, k)
    # renormalize selected probabilities (Megatron top-k softmax-then-norm)
    top_p = top_p / jnp.maximum(top_p.sum(-1, keepdims=True), 1e-9)

    aux = {
        "aux_loss": cfg.aux_loss_coef * load_balancing_loss(top_p, top_i, e),
        "z_loss": cfg.z_loss_coef * z_loss(logits),
    }

    if cfg.dropless:
        out = _dropless_dispatch(params, xt, top_p, top_i, k, e)
        aux["fraction_dropped"] = jnp.zeros((), jnp.float32)
        return out.reshape(b, s, h).astype(x.dtype), aux

    capacity = int(max(1, cfg.capacity_factor * t * k / e))

    # position of each (token, slot) within its expert, via cumsum over the
    # flattened routing mask (≙ MegaBlocks cumsum/histogram index build)
    onehot = jax.nn.one_hot(top_i, e, dtype=jnp.int32)        # [T, k, E]
    flat = onehot.reshape(t * k, e)
    pos_in_expert = jnp.cumsum(flat, axis=0) * flat - 1        # [T*k, E]
    pos = pos_in_expert.max(axis=-1).reshape(t, k)             # [T, k]
    keep = (pos < capacity) & (pos >= 0)
    top_p = jnp.where(keep, top_p, 0.0)

    # dispatch tensor [T, E, C] (one-hot over expert & position)
    pos_clip = jnp.clip(pos, 0, capacity - 1)
    dispatch = (
        jax.nn.one_hot(pos_clip, capacity, dtype=x.dtype)[:, :, None, :]
        * onehot.astype(x.dtype)[:, :, :, None]
        * keep.astype(x.dtype)[:, :, None, None]
    ).sum(axis=1)                                              # [T, E, C]

    expert_in = jnp.einsum("th,tec->ech", xt, dispatch)        # [E, C, H]
    we = params["experts"]
    gated = jax.nn.silu(
        jnp.einsum("ech,ehf->ecf", expert_in, we["w_gate"])
    ) * jnp.einsum("ech,ehf->ecf", expert_in, we["w_up"])
    expert_out = jnp.einsum("ecf,efh->ech", gated, we["w_down"])  # [E, C, H]

    combine = dispatch * (
        (top_p[:, :, None] * onehot.astype(jnp.float32)).sum(axis=1)[:, :, None]
    ).astype(x.dtype)                                          # weight per (t,e,c)
    out = jnp.einsum("ech,tec->th", expert_out, combine).reshape(b, s, h)

    aux["fraction_dropped"] = 1.0 - keep.mean()
    return out.astype(x.dtype), aux
