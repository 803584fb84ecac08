"""Token sampling: greedy, temperature, top-k, top-p, repetition penalty.

Feature parity with the reference's Megatron-native sampler
(megatron_patch/generation/generation.py:109-353 — modify_logits_for_top_k/
top_p filtering, repetition penalty, greedy) and the eval adapter's greedy
decode. All ops are jit-compatible (static shapes, no data-dependent slicing).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from leopard_tpu.config import GenerateConfig

NEG_INF = -1e30


def apply_repetition_penalty(
    logits: jnp.ndarray,        # [B, V] fp32
    prev_tokens: jnp.ndarray,   # [B, S] int32 (pad slots allowed)
    prev_mask: jnp.ndarray,     # [B, S] bool — True where a real token
    penalty: float,
) -> jnp.ndarray:
    """CTRL-style: divide positive logits / multiply negative logits of seen
    tokens by `penalty`."""
    if penalty == 1.0:
        return logits
    b, v = logits.shape
    seen = jnp.zeros((b, v), jnp.bool_)
    onehot = jax.nn.one_hot(prev_tokens, v, dtype=jnp.bool_)
    onehot = onehot & prev_mask[..., None]
    seen = jnp.any(onehot, axis=1)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def top_k_filter(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering: keep the smallest set of tokens whose cumulative
    probability exceeds p (the top token always survives)."""
    if p <= 0.0 or p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens where the cumulative prob *before* them is < p
    keep_sorted = (cum - probs) < p
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < threshold, NEG_INF, logits)


def sample(
    logits: jnp.ndarray,           # [B, V] fp32
    key: jax.Array,
    cfg: GenerateConfig,
    prev_tokens: Optional[jnp.ndarray] = None,
    prev_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Returns sampled token ids [B] int32."""
    if cfg.repetition_penalty != 1.0 and prev_tokens is not None:
        logits = apply_repetition_penalty(
            logits, prev_tokens, prev_mask, cfg.repetition_penalty
        )
    if cfg.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if cfg.temperature != 1.0:
        logits = logits / cfg.temperature
    logits = top_k_filter(logits, cfg.top_k)
    logits = top_p_filter(logits, cfg.top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
