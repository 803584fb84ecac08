"""Context parallelism: ring attention over the "seq" mesh axis.

TPU-native replacement for the reference's CP support (CP process groups at
megatron/core/parallel_state.py:306,783-798 + TransformerEngine ring attention
wired at custom_layers/transformer_engine.py:444-451): the sequence dimension
is sharded over the "seq" axis, each device computes attention of its local
query block against KV blocks that rotate around the ring via `ppermute`,
accumulating with an online softmax — flash-style memory and compute that
scales with S/n per device, communication overlapped by XLA's scheduler.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

NEG_INF = -1e30


def _block_attention_update(m, l, acc, q, k, v, mask, scale):
    """One online-softmax accumulation step (same math as chunked_attention)."""
    b, sq, hkv, group, d = q.shape
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)
    m_blk = jnp.max(scores, axis=-1)
    m_new = jnp.maximum(m, m_blk)
    p = jnp.exp(scores - m_new[..., None])
    alpha = jnp.exp(m - m_new)
    l_new = l * alpha + jnp.sum(p, axis=-1)
    acc_new = acc * alpha[..., None] + jnp.einsum(
        "bhgqk,bkhd->bhgqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return m_new, l_new, acc_new


def ring_attention(
    q: jnp.ndarray,   # [B, S, Hq, D] — S sharded over `axis`
    k: jnp.ndarray,   # [B, S, Hkv, D]
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    axis: str = "seq",
    causal: bool = True,
    segment_ids: Optional[jnp.ndarray] = None,  # [B, S]
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Returns [B, S, Hq, D], sharded like q. Requires S % axis_size == 0.

    `sliding_window` masks q_pos - k_pos >= window (Mistral semantics), same
    as the dense/chunked/flash paths."""
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    if scale is None:
        scale = d**-0.5
    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)
    n = mesh.shape[axis]
    s_local = s // n

    spec4 = P(None, axis, None, None)
    spec2 = P(None, axis)

    def body(q_l, k_l, v_l, seg_l):
        my = jax.lax.axis_index(axis)
        # local shapes: [B, S/n, H, D]
        qg = q_l.astype(jnp.float32).reshape(b, s_local, hkv, group, d)
        q_pos = my * s_local + jnp.arange(s_local, dtype=jnp.int32)

        # mark accumulators as device-varying over the ring axis so the
        # fori_loop carry types line up under shard_map's VMA tracking
        def varying(x):
            return jax.lax.pcast(x, axis, to="varying")

        m = varying(jnp.full((b, hkv, group, s_local), NEG_INF, jnp.float32))
        l = varying(jnp.zeros((b, hkv, group, s_local), jnp.float32))
        acc = varying(jnp.zeros((b, hkv, group, s_local, d), jnp.float32))

        perm = [(i, (i + 1) % n) for i in range(n)]

        def ring_step(step, carry):
            m, l, acc, k_cur, v_cur, seg_cur = carry
            src = (my - step) % n  # which shard this KV block came from
            kv_pos = src * s_local + jnp.arange(s_local, dtype=jnp.int32)
            mask = (seg_l[:, :, None] == seg_cur[:, None, :]) & (
                seg_l[:, :, None] != 0
            ) & (seg_cur[:, None, :] != 0)
            if causal:
                mask = mask & (q_pos[None, :, None] >= kv_pos[None, None, :])
            if sliding_window is not None:
                mask = mask & (
                    q_pos[None, :, None] - kv_pos[None, None, :] < sliding_window
                )
            m, l, acc = _block_attention_update(
                m, l, acc, qg, k_cur.astype(jnp.float32), v_cur, mask, scale
            )
            # rotate KV to the next device (skipped after the last use)
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            seg_nxt = jax.lax.ppermute(seg_cur, axis, perm)
            return m, l, acc, k_nxt, v_nxt, seg_nxt

        carry = (m, l, acc, k_l, v_l, seg_l)
        carry = jax.lax.fori_loop(0, n, ring_step, carry)
        m, l, acc = carry[0], carry[1], carry[2]
        out = acc / jnp.maximum(l[..., None], 1e-30)
        out = out.transpose(0, 3, 1, 2, 4).reshape(b, s_local, hq, d)
        return out.astype(q_l.dtype)

    return shard_map(
        body, mesh=mesh,
        in_specs=(spec4, spec4, spec4, spec2),
        out_specs=spec4,
    )(q, k, v, segment_ids)
