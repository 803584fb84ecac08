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
