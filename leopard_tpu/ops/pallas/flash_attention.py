"""Pallas TPU flash attention (forward) with GQA, causal, and segment-id
masking.

TPU-native replacement for the reference's flash-attn varlen CUDA kernels
(megatron_patch/model/llava/transformer.py:53-58,456-516) and the fused
scaled-softmax kernels (Megatron-LM-MegaBlocks/megatron/fused_kernels/
scaled_*_softmax*.cu): one kernel computes QK^T, masking, online softmax, and
PV accumulation per (batch, head, q-block), streaming KV blocks through VMEM.

Layout: grid (B, Hq, Sq/BQ, Skv/BK) with the KV dimension innermost — TPU
grids execute sequentially, so the online-softmax state (m, l, acc) lives in
VMEM scratch across KV iterations and the output block is written once on the
last KV step. GQA is expressed in the BlockSpec index maps (q head h reads kv
head h // group) — no KV replication in HBM.

Backward runs through the rematerialized blockwise-attention path
(ops/chunked_attention.py) via custom_vjp: flash-speed forward for inference/
prefill, flash-memory backward for training.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    q_seg_ref, kv_seg_ref,          # scalar-prefetch-free segment refs (VMEM)
    q_ref, k_ref, v_ref,            # [BQ, D], [BK, D]
    o_ref,                          # [BQ, D]
    m_scr, l_scr, acc_scr,          # VMEM scratch
    *,
    scale: float,
    causal: bool,
    sliding_window: Optional[int],
    block_q: int,
    block_k: int,
):
    bb = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = iq * block_q
    k_start = ik * block_k

    # causal: skip kv blocks strictly above the diagonal; sliding window:
    # also skip kv blocks entirely below the window band
    run = True
    if causal:
        run = q_start + block_q - 1 >= k_start
    if sliding_window is not None:
        in_band = k_start + block_k - 1 > q_start - sliding_window
        run = in_band if run is True else (run & in_band)

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                             # [BQ, BK]

        q_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_ids = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        # seg blocks carry the full batch dim (TPU tiling: a (1, block) int32
        # block is illegal for batch > 1); pick this program's row
        qseg = q_seg_ref[bb].reshape(block_q, 1)
        kseg = kv_seg_ref[bb].reshape(1, block_k)
        mask = (qseg == kseg) & (qseg != 0) & (kseg != 0)
        if causal:
            mask = mask & (q_ids >= k_ids)
        if sliding_window is not None:
            # same semantics as chunked/dense: attend iff q_pos - k_pos < window
            mask = mask & (q_ids - k_ids < sliding_window)
        scores = jnp.where(mask, scores, NEG_INF)

        m_prev = m_scr[:]                                     # [BQ, 128]
        m_blk = jnp.max(scores, axis=1, keepdims=True)        # [BQ, 1]
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_blk, m_prev.shape))
        alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])         # [BQ, 1]
        p = jnp.exp(scores - m_new[:, :1])                    # [BQ, BK]
        l_new = l_scr[:] * jnp.broadcast_to(alpha, l_scr.shape) + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_scr.shape
        )
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = m_new
        l_scr[:] = l_new

    @pl.when(ik == n_k - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "sliding_window", "block_q", "block_k"),
)
def _flash_forward(
    q, k, v, q_seg, kv_seg, *, causal, scale, sliding_window, block_q, block_k
):
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    group = hq // hkv
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    assert sq % block_q == 0 and skv % block_k == 0

    # [B, H, S, D] layout for blocking
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    grid = (b, hq, sq // block_q, skv // block_k)

    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        causal=causal,
        sliding_window=sliding_window,
        block_q=block_q,
        block_k=block_k,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, block_q), lambda bb, h, iq, ik: (0, iq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, block_k), lambda bb, h, iq, ik: (0, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bb, h, iq, ik: (bb, h, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bb, h, iq, ik, g=group: (bb, h // g, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bb, h, iq, ik, g=group: (bb, h // g, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bb, h, iq, ik: (bb, h, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(q_seg, kv_seg, qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9)
)
def _flash(q, k, v, q_seg, kv_seg, causal, scale, sliding_window, block_q, block_k):
    return _flash_forward(
        q, k, v, q_seg, kv_seg,
        causal=causal, scale=scale, sliding_window=sliding_window,
        block_q=block_q, block_k=block_k,
    )


def _flash_fwd(q, k, v, q_seg, kv_seg, causal, scale, sliding_window,
               block_q, block_k):
    out = _flash(q, k, v, q_seg, kv_seg, causal, scale, sliding_window,
                 block_q, block_k)
    return out, (q, k, v, q_seg, kv_seg)


def _flash_bwd(causal, scale, sliding_window, block_q, block_k, res, g):
    from leopard_tpu.ops.chunked_attention import chunked_attention

    q, k, v, q_seg, kv_seg = res

    def ref_fn(q, k, v):
        return chunked_attention(
            q, k, v, causal=causal, q_segment_ids=q_seg, kv_segment_ids=kv_seg,
            sliding_window=sliding_window,
            scale=scale, chunk_size=block_k, remat=True,
        )

    _, vjp = jax.vjp(ref_fn, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
) -> jnp.ndarray:
    """Flash attention on TPU. q: [B, Sq, Hq, D]; k/v: [B, Skv, Hkv, D].

    `sliding_window` masks q_pos - k_pos >= window (Mistral semantics,
    reference window arg: megatron_patch/model/idefics2/idefics_vlm_model.py:388)
    and skips kv blocks fully outside the band."""
    b, sq, _, d = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = d**-0.5
    if q_segment_ids is None:
        q_segment_ids = jnp.ones((b, sq), jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = jnp.ones((b, skv), jnp.int32)
    return _flash(
        q, k, v,
        q_segment_ids.astype(jnp.int32), kv_segment_ids.astype(jnp.int32),
        causal, float(scale),
        int(sliding_window) if sliding_window is not None else None,
        int(block_q), int(block_k),
    )
