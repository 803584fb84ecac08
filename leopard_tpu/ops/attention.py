"""Attention ops: GQA/MQA scaled-dot-product attention with masking features
covering everything the reference gets from flash-attn varlen + Megatron
CoreAttention (megatron_patch/model/llava/transformer.py:320-516):

  - causal or bidirectional
  - grouped-query (num_q_heads a multiple of num_kv_heads)
  - padding / packed-sequence masking via segment ids (≙ flash-attn varlen
    cu_seqlens: tokens attend only within their own segment)
  - sliding-window (Mistral) attention
  - explicit additive bias

`attention()` is the public entry; `impl="xla"` is the fused-by-XLA reference
path, `impl="flash"` calls the Pallas flash kernel
(leopard_tpu/ops/pallas/flash_attention.py) for long-sequence training.
Softmax is always computed in float32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large negative instead of -inf: keeps fully-masked rows finite


def make_attention_mask(
    q_len: int,
    kv_len: int,
    *,
    causal: bool = False,
    q_segment_ids: Optional[jnp.ndarray] = None,   # [B, Sq] int; 0 = padding
    kv_segment_ids: Optional[jnp.ndarray] = None,  # [B, Skv]
    sliding_window: Optional[int] = None,
    q_offset: int | jnp.ndarray = 0,
) -> Optional[jnp.ndarray]:
    """Boolean mask [B or 1, 1, Sq, Skv]; True = attend."""
    masks = []
    q_pos = jnp.arange(q_len)[:, None] + q_offset
    kv_pos = jnp.arange(kv_len)[None, :]
    if causal:
        masks.append((q_pos >= kv_pos)[None, None])
    if sliding_window is not None:
        masks.append((q_pos - kv_pos < sliding_window)[None, None])
    if q_segment_ids is not None and kv_segment_ids is not None:
        seg = q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]
        valid = (q_segment_ids[:, :, None] != 0) & (kv_segment_ids[:, None, :] != 0)
        masks.append((seg & valid)[:, None])
    if not masks:
        return None
    mask = masks[0]
    for m in masks[1:]:
        mask = mask & m
    return mask


def attention(
    q: jnp.ndarray,  # [B, Sq, Hq, D]
    k: jnp.ndarray,  # [B, Skv, Hkv, D]
    v: jnp.ndarray,  # [B, Skv, Hkv, D]
    *,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,          # [B|1, 1|Hq, Sq, Skv] bool
    bias: Optional[jnp.ndarray] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    sliding_window: Optional[int] = None,
    q_offset: int | jnp.ndarray = 0,
    scale: Optional[float] = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Returns [B, Sq, Hq, D] in q.dtype."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    assert hq % hkv == 0, f"{hq} q heads not a multiple of {hkv} kv heads"
    if scale is None:
        scale = d**-0.5

    if mask is None:
        mask = make_attention_mask(
            sq, skv,
            causal=causal,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            sliding_window=sliding_window,
            q_offset=q_offset,
        )

    if impl == "flash":
        from leopard_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(
            q, k, v,
            causal=causal,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            scale=scale,
        )

    group = hq // hkv
    qg = q.reshape(b, sq, hkv, group, d)
    return _attention_core(qg, k, v, mask, bias, scale, hq).astype(q.dtype)


def _attention_core(qg, k, v, mask, bias, scale, hq):
    b, sq, hkv, group, d = qg.shape
    skv = k.shape[1]
    # scores: [B, Hkv, G, Sq, Skv]
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if mask is not None:
        # mask [B|1, 1|Hq, Sq, Skv] → broadcast to [B, Hkv, G, Sq, Skv]
        if mask.shape[1] == 1:
            m = mask[:, :, None]
        else:
            m = mask.reshape(mask.shape[0], hkv, group, sq, skv)
        scores = jnp.where(m, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    compute_dtype = v.dtype if v.dtype != jnp.int8 else jnp.bfloat16
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs.astype(compute_dtype), v.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, sq, hq, d)


def attention_quant_kv(
    q: jnp.ndarray,        # [B, Sq, Hq, D]
    k_q: jnp.ndarray,      # [B, Skv, Hkv, D] int8
    k_s: jnp.ndarray,      # [B, Skv, Hkv] f32 per-token-per-head scale
    v_q: jnp.ndarray,      # [B, Skv, Hkv, D] int8
    v_s: jnp.ndarray,      # [B, Skv, Hkv] f32
    *,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Attention over an int8-quantized KV cache. The dequant folds into the
    score/output math instead of materializing a bf16 cache copy:
      scores = (q · k_int8) · k_scale[kv]     (per kv position & head)
      out    = (probs · v_scale[kv]) @ v_int8
    so the cache is read at int8 width (≈half the decode HBM traffic)."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k_q.shape
    group = hq // hkv
    if scale is None:
        scale = d**-0.5
    qg = q.reshape(b, sq, hkv, group, d)
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg.astype(jnp.bfloat16), k_q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    # k scale: [B, Skv, Hkv] → [B, Hkv, 1, 1, Skv]
    scores = scores * (scale * k_s.transpose(0, 2, 1)[:, :, None, None, :])
    if mask is not None:
        m = mask[:, :, None] if mask.shape[1] == 1 else mask.reshape(
            mask.shape[0], hkv, group, sq, skv
        )
        scores = jnp.where(m, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs * v_s.transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs.astype(jnp.bfloat16), v_q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, sq, hq, d).astype(q.dtype)
