"""Blockwise (chunked) attention with online softmax — pure JAX.

The memory-bounded attention path for 16k-token training (the role flash-attn
varlen plays in the reference, megatron_patch/model/llava/transformer.py:
456-516): keys/values are processed in chunks under `lax.scan` carrying
running (max, denominator, weighted-sum), so peak memory is O(S·BK) instead
of O(S²); each chunk body is rematerialized in the backward pass
(jax.checkpoint), giving flash-style memory at ~2× chunk recompute — all in
XLA-fusable ops, differentiable, and shard_map-compatible.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def chunked_attention(
    q: jnp.ndarray,  # [B, Sq, Hq, D]
    k: jnp.ndarray,  # [B, Skv, Hkv, D]
    v: jnp.ndarray,  # [B, Skv, Hkv, D]
    *,
    causal: bool = True,
    q_segment_ids: Optional[jnp.ndarray] = None,   # [B, Sq]
    kv_segment_ids: Optional[jnp.ndarray] = None,  # [B, Skv]
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
    chunk_size: int = 512,
    remat: bool = True,
) -> jnp.ndarray:
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    assert hq % hkv == 0
    group = hq // hkv
    if scale is None:
        scale = d**-0.5
    bk = min(chunk_size, skv)
    assert skv % bk == 0, f"kv len {skv} not divisible by chunk {bk}"
    n_chunks = skv // bk

    if q_segment_ids is None:
        q_segment_ids = jnp.ones((b, sq), jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = jnp.ones((b, skv), jnp.int32)

    # [B, Hkv, G, Sq, D] query layout; compute in fp32 accumulators
    qg = q.reshape(b, sq, hkv, group, d).transpose(0, 2, 3, 1, 4)
    kc = k.transpose(0, 2, 1, 3).reshape(b, hkv, n_chunks, bk, d)
    vc = v.transpose(0, 2, 1, 3).reshape(b, hkv, n_chunks, bk, d)
    kv_seg_c = kv_segment_ids.reshape(b, n_chunks, bk)

    q_pos = jnp.arange(sq, dtype=jnp.int32)

    def chunk_body(carry, xs):
        m, l, acc = carry                        # [B,Hkv,G,Sq], same, [...,Sq,D]
        k_blk, v_blk, kvseg_blk, c_idx = xs      # [B,Hkv,bk,D], ..., [B,bk], scalar
        scores = jnp.einsum(
            "bhgqd,bhkd->bhgqk", qg, k_blk, preferred_element_type=jnp.float32
        ) * scale                                # [B,Hkv,G,Sq,bk]
        kv_pos = c_idx * bk + jnp.arange(bk, dtype=jnp.int32)
        mask = (q_segment_ids[:, :, None] == kvseg_blk[:, None, :]) & (
            q_segment_ids[:, :, None] != 0
        ) & (kvseg_blk[:, None, :] != 0)          # [B,Sq,bk]
        if causal:
            mask = mask & (q_pos[None, :, None] >= kv_pos[None, None, :])
        if sliding_window is not None:
            mask = mask & (
                q_pos[None, :, None] - kv_pos[None, None, :] < sliding_window
            )
        scores = jnp.where(mask[:, None, None], scores, NEG_INF)
        m_blk = jnp.max(scores, axis=-1)
        m_new = jnp.maximum(m, m_blk)
        # renormalize old accumulator, add this block
        p = jnp.exp(scores - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhgqk,bhkd->bhgqd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        return (m_new, l_new, acc_new), None

    if remat:
        chunk_body = jax.checkpoint(chunk_body, prevent_cse=False)

    m0 = jnp.full((b, hkv, group, sq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, group, sq), jnp.float32)
    acc0 = jnp.zeros((b, hkv, group, sq, d), jnp.float32)
    xs = (
        kc.transpose(2, 0, 1, 3, 4),          # [n_chunks, B, Hkv, bk, D]
        vc.transpose(2, 0, 1, 3, 4),
        kv_seg_c.transpose(1, 0, 2),          # [n_chunks, B, bk]
        jnp.arange(n_chunks, dtype=jnp.int32),
    )
    (m, l, acc), _ = jax.lax.scan(chunk_body, (m0, l0, acc0), xs)
    out = acc / jnp.maximum(l[..., None], 1e-30)
    # [B,Hkv,G,Sq,D] → [B,Sq,Hq,D]
    out = out.transpose(0, 3, 1, 2, 4).reshape(b, sq, hq, d)
    return out.astype(q.dtype)


def chunked_continuation_attention(
    q: jnp.ndarray,            # [B, Sq, Hq, D] — the NEW tokens' queries
    k: jnp.ndarray,            # [B, Skv, Hkv, D] cache keys (float or int8)
    v: jnp.ndarray,            # [B, Skv, Hkv, D] cache values
    kv_valid: jnp.ndarray,     # [B, Skv] — cache-slot validity (seg != 0)
    q_positions: jnp.ndarray,  # [B, Sq] int32 absolute positions
    *,
    k_scale: Optional[jnp.ndarray] = None,  # [B, Skv, Hkv] f32 (int8 cache)
    v_scale: Optional[jnp.ndarray] = None,
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
    chunk_size: int = 512,
) -> jnp.ndarray:
    """Flash-class CONTINUATION prefill: S new queries attend to an existing
    KV cache (which already contains the new tokens) in O(Sq·chunk) memory
    instead of the dense sweep's O(Sq·Skv) mask+scores. The cache's
    slot==absolute-position invariant (models/decoder.py KVCache) makes
    causality a position compare: query at position p attends to slots ≤ p
    that hold valid tokens. Replaces the reference's flash-attn varlen prefill
    into past context (megatron_patch/model/llava/transformer.py:508).

    int8 caches pass k/v quantized with per-token-per-head scales; the
    dequant folds into the score/output math per chunk (the cache is only
    ever read at int8 width)."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    assert hq % hkv == 0
    group = hq // hkv
    if scale is None:
        scale = d**-0.5
    bk = min(chunk_size, skv)
    assert skv % bk == 0, f"cache len {skv} not divisible by chunk {bk}"
    n_chunks = skv // bk
    quant = k.dtype == jnp.int8
    compute_dt = jnp.bfloat16 if quant else k.dtype

    qg = q.reshape(b, sq, hkv, group, d).transpose(0, 2, 3, 1, 4)  # [B,H,G,Sq,D]
    kc = k.transpose(0, 2, 1, 3).reshape(b, hkv, n_chunks, bk, d)
    vc = v.transpose(0, 2, 1, 3).reshape(b, hkv, n_chunks, bk, d)
    valid_c = (kv_valid != 0).reshape(b, n_chunks, bk)
    xs = [
        kc.transpose(2, 0, 1, 3, 4),
        vc.transpose(2, 0, 1, 3, 4),
        valid_c.transpose(1, 0, 2),
        jnp.arange(n_chunks, dtype=jnp.int32),
    ]
    if quant:
        # [B, Skv, Hkv] → [n, B, Hkv, bk]
        ksc = k_scale.transpose(0, 2, 1).reshape(b, hkv, n_chunks, bk)
        vsc = v_scale.transpose(0, 2, 1).reshape(b, hkv, n_chunks, bk)
        xs += [ksc.transpose(2, 0, 1, 3), vsc.transpose(2, 0, 1, 3)]

    def chunk_body(carry, xs_blk):
        m, l, acc = carry
        if quant:
            k_blk, v_blk, valid_blk, c_idx, ks_blk, vs_blk = xs_blk
        else:
            k_blk, v_blk, valid_blk, c_idx = xs_blk
        scores = jnp.einsum(
            "bhgqd,bhkd->bhgqk", qg.astype(compute_dt), k_blk.astype(compute_dt),
            preferred_element_type=jnp.float32,
        )
        if quant:
            scores = scores * (scale * ks_blk[:, :, None, None, :])
        else:
            scores = scores * scale
        kv_pos = c_idx * bk + jnp.arange(bk, dtype=jnp.int32)
        mask = valid_blk[:, None, :] & (
            q_positions[:, :, None] >= kv_pos[None, None, :]
        )
        if sliding_window is not None:
            mask = mask & (
                q_positions[:, :, None] - kv_pos[None, None, :] < sliding_window
            )
        scores = jnp.where(mask[:, None, None], scores, NEG_INF)
        m_blk = jnp.max(scores, axis=-1)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(scores - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        if quant:
            p = p * vs_blk[:, :, None, None, :]
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhgqk,bhkd->bhgqd", p.astype(compute_dt), v_blk.astype(compute_dt),
            preferred_element_type=jnp.float32,
        )
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((b, hkv, group, sq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, group, sq), jnp.float32)
    acc0 = jnp.zeros((b, hkv, group, sq, d), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(chunk_body, (m0, l0, acc0), tuple(xs))
    out = acc / jnp.maximum(l[..., None], 1e-30)
    out = out.transpose(0, 3, 1, 2, 4).reshape(b, sq, hq, d)
    return out.astype(q.dtype)
