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
    """One online-softmax accumulation step (same math as chunked_attention).
    mask=None means the block is fully unmasked (no where, no wasted lanes)."""
    b, sq, hkv, group, d = q.shape
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
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


def zigzag_indices(s: int, n: int):
    """Zig-zag (balanced-causal) sequence layout for n CP ranks: split S into
    2n chunks of c = S/(2n); rank d holds chunks (d, 2n-1-d). Under a causal
    mask every rank then owns an equal share of the attention work (the
    reference's TE CP uses the same balanced striping,
    custom_layers/transformer_engine.py:444-451). Returns (perm, inv) index
    arrays: x_zigzag = x[perm]; x = x_zigzag[inv]."""
    import numpy as np

    c = s // (2 * n)
    perm = np.concatenate(
        [
            np.r_[d * c : (d + 1) * c, (2 * n - 1 - d) * c : (2 * n - d) * c]
            for d in range(n)
        ]
    )
    return perm, np.argsort(perm)


def _zigzag_ring(q, k, v, segment_ids, mesh, axis, sliding_window, scale):
    """Balanced causal ring attention on zig-zag-ordered inputs.

    Work-optimal: step 0 does the 3 local causal blocks; every later ring step
    does exactly TWO fully-unmasked c×c blocks per device (q_late×kv_early
    always, plus q_early×kv_early when the incoming KV is from a lower rank
    else q_late×kv_late) — ~(2n+1)/(4n) ≈ half the flops of the masked
    contiguous ring, and identical across devices (no causal straggler)."""
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    n = mesh.shape[axis]
    c = s // (2 * n)  # chunk size; each device holds 2 chunks
    have_seg = segment_ids is not None
    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)

    spec4 = P(None, axis, None, None)
    spec2 = P(None, axis)

    def blk_mask(q_pos, k_pos, seg_q, seg_k, causal_blk):
        """[B, c, c] mask, or None when the block is fully unmasked."""
        if not (have_seg or sliding_window is not None or causal_blk):
            return None
        m = jnp.ones((b, c, c), bool)
        if have_seg:
            m = m & (seg_q[:, :, None] == seg_k[:, None, :]) & (
                seg_q[:, :, None] != 0
            ) & (seg_k[:, None, :] != 0)
        if causal_blk:
            m = m & (q_pos[:, None] >= k_pos[None, :])[None]
        if sliding_window is not None:
            m = m & (
                (q_pos[:, None] - k_pos[None, :]) < sliding_window
            )[None]
        return m

    def body(q_l, k_l, v_l, seg_l):
        my = jax.lax.axis_index(axis)

        def varying(x):
            return jax.lax.pcast(x, axis, to="varying")

        ar = jnp.arange(c, dtype=jnp.int32)
        pq_e = my * c + ar                  # early q chunk positions
        pq_l = (2 * n - 1 - my) * c + ar    # late q chunk positions

        qg = q_l.astype(jnp.float32).reshape(b, 2 * c, hkv, group, d)
        q_e, q_late = qg[:, :c], qg[:, c:]
        seg_qe, seg_ql = seg_l[:, :c], seg_l[:, c:]

        def accs():
            return (
                varying(jnp.full((b, hkv, group, c), NEG_INF, jnp.float32)),
                varying(jnp.zeros((b, hkv, group, c), jnp.float32)),
                varying(jnp.zeros((b, hkv, group, c, d), jnp.float32)),
            )

        me, le, acce = accs()   # accumulators for q_early
        ml, ll, accl = accs()   # accumulators for q_late

        # ---- step 0: local causal blocks (q_e×k_e diag, q_l×k_e full,
        # q_l×k_l diag); q_e×k_l is entirely in the future → skipped ----
        k0 = k_l.astype(jnp.float32)
        k0_e, k0_l = k0[:, :c], k0[:, c:]
        v0_e, v0_l = v_l[:, :c], v_l[:, c:]
        me, le, acce = _block_attention_update(
            me, le, acce, q_e, k0_e, v0_e,
            blk_mask(pq_e, pq_e, seg_qe, seg_qe, True), scale)
        ml, ll, accl = _block_attention_update(
            ml, ll, accl, q_late, k0_e, v0_e,
            blk_mask(pq_l, pq_e, seg_ql, seg_qe, False), scale)
        ml, ll, accl = _block_attention_update(
            ml, ll, accl, q_late, k0_l, v0_l,
            blk_mask(pq_l, pq_l, seg_ql, seg_ql, True), scale)

        perm = [(i, (i + 1) % n) for i in range(n)]

        def ring_step(t, carry):
            me, le, acce, ml, ll, accl, k_cur, v_cur, seg_cur = carry
            # rotate first: at iteration t we hold KV from src = (my - t) % n
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            seg_cur = jax.lax.ppermute(seg_cur, axis, perm)
            src = (my - t) % n
            src_lt = src < my
            kf = k_cur.astype(jnp.float32)
            k_e, k_lt = kf[:, :c], kf[:, c:]
            v_e, v_lt = v_cur[:, :c], v_cur[:, c:]
            sg_e, sg_l = seg_cur[:, :c], seg_cur[:, c:]
            pk_e = src * c + ar
            pk_l = (2 * n - 1 - src) * c + ar

            # block A: q_late × kv_early — valid in BOTH cases, never causal-
            # masked (kv_early chunk < n ≤ late q chunk)
            ml, ll, accl = _block_attention_update(
                ml, ll, accl, q_late, k_e, v_e,
                blk_mask(pq_l, pk_e, seg_ql, sg_e, False), scale)

            # block B: src<my → q_early×kv_early (updates e-accs);
            #          src>my → q_late×kv_late (updates l-accs).
            # One einsum on selected operands, then scatter back by case.
            w = src_lt
            q_sel = jnp.where(w, q_e, q_late)
            k_sel = jnp.where(w, k_e, k_lt)
            v_sel = jnp.where(w, v_e, v_lt)
            pq_sel = jnp.where(w, pq_e, pq_l)
            pk_sel = jnp.where(w, pk_e, pk_l)
            sq_sel = jnp.where(w, seg_qe, seg_ql)
            sk_sel = jnp.where(w, sg_e, sg_l)
            m_sel = jnp.where(w, me, ml)
            l_sel = jnp.where(w, le, ll)
            a_sel = jnp.where(w, acce, accl)
            m2, l2, a2 = _block_attention_update(
                m_sel, l_sel, a_sel, q_sel, k_sel, v_sel,
                blk_mask(pq_sel, pk_sel, sq_sel, sk_sel, False), scale)
            me = jnp.where(w, m2, me)
            le = jnp.where(w, l2, le)
            acce = jnp.where(w, a2, acce)
            ml = jnp.where(w, ml, m2)
            ll = jnp.where(w, ll, l2)
            accl = jnp.where(w, accl, a2)
            return (me, le, acce, ml, ll, accl, k_cur, v_cur, seg_cur)

        # unrolled: n is static and small; unrolling lets XLA's latency-hiding
        # scheduler overlap each step's ppermute with the previous compute
        carry = (me, le, acce, ml, ll, accl, k_l, v_l, seg_l)
        for t in range(1, n):
            carry = ring_step(t, carry)
        me, le, acce, ml, ll, accl = carry[:6]

        def finish(l_, acc_):
            o = acc_ / jnp.maximum(l_[..., None], 1e-30)
            return o.transpose(0, 3, 1, 2, 4).reshape(b, c, hq, d)

        out = jnp.concatenate([finish(le, acce), finish(ll, accl)], axis=1)
        return out.astype(q_l.dtype)

    return shard_map(
        body, mesh=mesh,
        in_specs=(spec4, spec4, spec4, spec2),
        out_specs=spec4,
    )(q, k, v, segment_ids)


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
    layout: str = "zigzag",
    pre_permuted: bool = False,
) -> jnp.ndarray:
    """Returns [B, S, Hq, D], sharded like q. Requires S % axis_size == 0.

    `sliding_window` masks q_pos - k_pos >= window (Mistral semantics), same
    as the dense/chunked/flash paths.

    `layout="zigzag"` (default) re-orders the sequence into the balanced
    zig-zag layout, runs the work-optimal causal ring, and restores order —
    ~2× fewer attention flops than the masked contiguous ring and no causal
    load imbalance across CP ranks. Falls back to the contiguous ring when
    the shape doesn't permit (non-causal, or S not divisible by 2·n).

    `pre_permuted=True` asserts q/k/v/segment_ids are ALREADY in zig-zag
    order (and the output is returned in that order): the caller permutes
    the hidden states once for the whole layer stack instead of paying the
    cross-shard gather per layer (≙ TE CP striping the data once)."""
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    if scale is None:
        scale = d**-0.5
    n = mesh.shape[axis]
    if pre_permuted:
        assert layout == "zigzag" and causal and s % (2 * n) == 0 and n > 1
        return _zigzag_ring(q, k, v, segment_ids, mesh, axis,
                            sliding_window, scale)
    if layout == "zigzag" and causal and s % (2 * n) == 0 and n > 1:
        perm, inv = zigzag_indices(s, n)
        seg_p = segment_ids[:, perm] if segment_ids is not None else None
        out = _zigzag_ring(
            q[:, perm], k[:, perm], v[:, perm], seg_p,
            mesh, axis, sliding_window, scale,
        )
        return out[:, inv]
    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)

    spec4 = P(None, axis, None, None)
    spec2 = P(None, axis)

    def body(q_l, k_l, v_l, seg_l):
        return ring_attention_local(
            q_l, k_l, v_l, seg_l, axis=axis, n_shards=n, causal=causal,
            sliding_window=sliding_window, scale=scale,
        )

    return shard_map(
        body, mesh=mesh,
        in_specs=(spec4, spec4, spec4, spec2),
        out_specs=spec4,
    )(q, k, v, segment_ids)


def ring_attention_local(
    q_l: jnp.ndarray,    # [B, S/n, Hq, D] — LOCAL shard (inside shard_map)
    k_l: jnp.ndarray,
    v_l: jnp.ndarray,
    seg_l: jnp.ndarray,  # [B, S/n] local segment ids
    *,
    axis: str,
    n_shards: int,
    causal: bool = True,
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Contiguous-layout ring attention on *local* shards, callable inside an
    enclosing shard_map whose manual axes include `axis` (used by the 1F1B
    pipeline to compose PP×CP in one SPMD program — the wrapper above is just
    this plus the shard_map). Assumes contiguous sequence sharding."""
    b, s_local, hq, d = q_l.shape
    hkv = k_l.shape[2]
    group = hq // hkv
    n = n_shards
    if scale is None:
        scale = d**-0.5
    my = jax.lax.axis_index(axis)
    qg = q_l.astype(jnp.float32).reshape(b, s_local, hkv, group, d)
    q_pos = my * s_local + jnp.arange(s_local, dtype=jnp.int32)

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
        if step < n - 1:
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            seg_cur = jax.lax.ppermute(seg_cur, axis, perm)
        return m, l, acc, k_cur, v_cur, seg_cur

    # unrolled (static n): enables ppermute/compute overlap scheduling
    carry = (m, l, acc, k_l, v_l, seg_l)
    for step in range(n):
        carry = ring_step(step, carry)
    m, l, acc = carry[0], carry[1], carry[2]
    out = acc / jnp.maximum(l[..., None], 1e-30)
    out = out.transpose(0, 3, 1, 2, 4).reshape(b, s_local, hq, d)
    return out.astype(q_l.dtype)
