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

Backward is a pair of Pallas kernels (FlashAttention-2 style): the forward
additionally saves the per-row logsumexp; dk/dv accumulate over q blocks
(computed per q-head and group-summed outside), dq accumulates over kv
blocks, with delta = rowsum(dO·O) precomputed in XLA. bwd_impl="chunked"
falls back to the rematerialized blockwise path (ops/chunked_attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leopard_tpu.ops.remat import tag_attn_out, tag_flash_lse

NEG_INF = -1e30


def _flash_kernel(
    q_seg_ref, kv_seg_ref,          # scalar-prefetch-free segment refs (VMEM)
    q_ref, k_ref, v_ref,            # [BQ, D], [BK, D]
    o_ref,                          # [BQ, D]
    *rest,                          # [lse_ref if save_lse,] m/l/acc scratch
    scale: float,
    causal: bool,
    sliding_window: Optional[int],
    block_q: int,
    block_k: int,
    save_lse: bool,
    single_pass: bool,
    kv_only_mask: bool,
):
    if save_lse:
        # [BQ, 128] lane-replicated logsumexp (TPU tiling wants a 128 last
        # dim) — only materialized for the training forward. The 128×
        # replication is deliberate waste: a compact [B, H, S] residual needs
        # lane↔sublane relayouts in every kernel, and the replicated copy is
        # ≲0.5% of train-step time at our profiles (weight re-reads dominate
        # under full remat), so the simpler layout wins.
        lse_ref, *scratch = rest
    else:
        scratch = rest
    if not single_pass:
        m_scr, l_scr, acc_scr = scratch
    bb = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    n_k = pl.num_programs(3)

    def masked_scores():
        # dot in the INPUT dtype with fp32 accumulation: bf16×bf16→fp32 is
        # exact for bf16 inputs and runs at full MXU rate (an fp32×fp32 dot
        # costs ~4-6 MXU passes); fp32 inputs (tests) still get an fp32 dot
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                             # [BQ, BK]
        # seg blocks carry the full batch dim (TPU tiling: a (1, block) int32
        # block is illegal for batch > 1); pick this program's row
        kseg = kv_seg_ref[bb].reshape(1, block_k)
        if kv_only_mask:
            # validity-style segments (0/1: right-padded rows, patch masks —
            # valid tokens form a prefix): masking reduces to an invalid-kv
            # column bias — one broadcast add instead of a [BQ, BK] boolean
            # compare chain. Fully-masked q rows get garbage either way (see
            # note below); callers discard them. Under causal/sliding-window
            # the band mask is applied ONLY on blocks the band edge actually
            # crosses (a scalar-predicated branch): interior blocks skip all
            # iota/compare/select VPU work, which dominated the kernel at
            # decoder-prefill shapes (the dots are ~0.7 µs/block on the MXU;
            # mask construction was ~2× that on the VPU).
            scores = scores + jnp.where(kseg == 0, NEG_INF, 0.0)
            if not causal and sliding_window is None:
                return scores
            q_start = iq * block_q
            k_start = ik * block_k
            q_ids = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            k_ids = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            m = None
            if causal:
                m = q_ids >= k_ids
            if sliding_window is not None:
                w = q_ids - k_ids < sliding_window
                m = w if m is None else (m & w)
            return jnp.where(m, scores, NEG_INF)
        q_start = iq * block_q
        k_start = ik * block_k
        q_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_ids = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        qseg = q_seg_ref[bb].reshape(block_q, 1)
        mask = (qseg == kseg) & (qseg != 0) & (kseg != 0)
        if causal:
            mask = mask & (q_ids >= k_ids)
        if sliding_window is not None:
            # same semantics as chunked/dense: attend iff q_pos - k_pos < window
            mask = mask & (q_ids - k_ids < sliding_window)
        # NOTE fully-masked rows: scores become NEG_INF everywhere, so the
        # softmax below is uniform garbage for those rows — callers must
        # discard/ignore them (tests index [valid]); this matches the
        # reference's flash-attn varlen behavior for padding rows.
        return jnp.where(mask, scores, NEG_INF)

    if single_pass:
        # all of kv in one block (short non-causal sequences, e.g. the
        # SigLIP tower at 676→768 patches): plain softmax, no online-rescale
        # state, no scratch round-trips
        scores = masked_scores()
        m = jnp.max(scores, axis=1, keepdims=True)            # [BQ, 1]
        p = jnp.exp(scores - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        denom = jnp.maximum(l, 1e-30)
        acc = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = (acc / denom).astype(o_ref.dtype)
        if save_lse:
            lse_ref[0, 0] = jnp.broadcast_to(
                m + jnp.log(denom), (block_q, 128)
            )
        return

    q_start = iq * block_q
    k_start = ik * block_k

    # causal: skip kv blocks strictly above the diagonal; sliding window:
    # also skip kv blocks entirely below the window band (same predicate as
    # the backward kernels — keep them in lockstep)
    run = _should_run(q_start, k_start, causal=causal,
                      sliding_window=sliding_window,
                      block_q=block_q, block_k=block_k)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(run)
    def _compute():
        scores = masked_scores()

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
        if save_lse:
            lse_ref[0, 0] = jnp.broadcast_to(
                m_scr[:, :1] + jnp.log(denom), (lse_ref.shape[2], 128)
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "scale", "sliding_window", "block_q", "block_k", "save_lse",
        "kv_only_mask",
    ),
)
def _flash_forward(
    q, k, v, q_seg, kv_seg, *, causal, scale, sliding_window, block_q, block_k,
    save_lse=False, kv_only_mask=False,
):
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    group = hq // hkv
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    assert sq % block_q == 0 and skv % block_k == 0
    single_pass = skv == block_k and not causal and sliding_window is None

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
        save_lse=save_lse,
        single_pass=single_pass,
        kv_only_mask=kv_only_mask,
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
        out_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bb, h, iq, ik: (bb, h, iq, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + ([
            pl.BlockSpec(
                (1, 1, block_q, 128), lambda bb, h, iq, ik: (bb, h, iq, 0),
                memory_space=pltpu.VMEM,
            ),
        ] if save_lse else []),
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, sq, d), q.dtype),
        ] + ([
            jax.ShapeDtypeStruct((b, hq, sq, 128), jnp.float32),
        ] if save_lse else []),
        scratch_shapes=[] if single_pass else [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(q_seg, kv_seg, qt, kt, vt)
    if save_lse:
        out, lse = out
        return out.transpose(0, 2, 1, 3), lse
    return out[0].transpose(0, 2, 1, 3), None


def _bwd_mask_and_p(
    q_seg_ref, kv_seg_ref, q_ref, k_ref, lse_ref, bb, q_start, k_start,
    *, scale, causal, sliding_window, block_q, block_k, kv_only_mask=False,
):
    """Recompute the probability block P = exp(S − lse) under the mask.
    Shared by the dq and dk/dv kernels."""
    q = q_ref[0, 0]          # input dtype; dots accumulate fp32 (see fwd note)
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                                  # [BQ, BK]
    kseg = kv_seg_ref[bb].reshape(1, block_k)
    lse = lse_ref[0, 0][:, :1]                                 # [BQ, 1]
    if kv_only_mask:
        # validity-style segments: the forward's lse is finite for every row
        # (prefix-valid kv ⇒ even invalid/causal-early q rows attended at
        # least one finite column), so exp(s − lse) cannot blow up; invalid
        # kv columns zero out via exp(−∞). Invalid q rows carry zero upstream
        # grads (callers discard them), so their p never pollutes dk/dv.
        # Band masks mirror the forward: applied only on edge-crossing blocks.
        s = s + jnp.where(kseg == 0, NEG_INF, 0.0)
        if not causal and sliding_window is None:
            return q, k, jnp.exp(s - lse)

        def _band(x):
            q_ids = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            k_ids = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            m = None
            if causal:
                m = q_ids >= k_ids
            if sliding_window is not None:
                w = q_ids - k_ids < sliding_window
                m = w if m is None else (m & w)
            return jnp.where(m, x, NEG_INF)

        crosses = None
        if causal:
            crosses = k_start + block_k - 1 > q_start
        if sliding_window is not None:
            w_edge = q_start + block_q - 1 - k_start >= sliding_window
            crosses = w_edge if crosses is None else (crosses | w_edge)
        s = jax.lax.cond(crosses, _band, lambda x: x, s)
        return q, k, jnp.exp(s - lse)
    q_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_ids = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    qseg = q_seg_ref[bb].reshape(block_q, 1)
    mask = (qseg == kseg) & (qseg != 0) & (kseg != 0)
    if causal:
        mask = mask & (q_ids >= k_ids)
    if sliding_window is not None:
        mask = mask & (q_ids - k_ids < sliding_window)
    # explicit mask multiply: for fully-masked rows lse is ~NEG_INF and
    # exp(s − lse) would otherwise blow up
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)                 # [BQ, BK]
    return q, k, p


def _should_run(q_start, k_start, *, causal, sliding_window, block_q, block_k):
    run = True
    if causal:
        run = q_start + block_q - 1 >= k_start
    if sliding_window is not None:
        in_band = k_start + block_k - 1 > q_start - sliding_window
        run = in_band if run is True else (run & in_band)
    return run


def _flash_bwd_dq_kernel(
    q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dq_scr,
    *, scale, causal, sliding_window, block_q, block_k, kv_only_mask,
):
    bb = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q_start = iq * block_q
    k_start = ik * block_k
    run = _should_run(q_start, k_start, causal=causal,
                      sliding_window=sliding_window,
                      block_q=block_q, block_k=block_k)

    @pl.when(run)
    def _compute():
        _, k, p = _bwd_mask_and_p(
            q_seg_ref, kv_seg_ref, q_ref, k_ref, lse_ref, bb, q_start, k_start,
            scale=scale, causal=causal, sliding_window=sliding_window,
            block_q=block_q, block_k=block_k, kv_only_mask=kv_only_mask,
        )
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                      # [BQ, BK]
        delta = delta_ref[0, 0][:, :1]
        ds = (p * (dp - delta) * scale).astype(k.dtype)
        dq_scr[:] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(ik == n_k - 1)
    def _fin():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale, causal, sliding_window, block_q, block_k, kv_only_mask,
):
    bb = pl.program_id(0)
    ik = pl.program_id(2)
    iq = pl.program_id(3)
    n_q = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q_start = iq * block_q
    k_start = ik * block_k
    run = _should_run(q_start, k_start, causal=causal,
                      sliding_window=sliding_window,
                      block_q=block_q, block_k=block_k)

    @pl.when(run)
    def _compute():
        q, _, p = _bwd_mask_and_p(
            q_seg_ref, kv_seg_ref, q_ref, k_ref, lse_ref, bb, q_start, k_start,
            scale=scale, causal=causal, sliding_window=sliding_window,
            block_q=block_q, block_k=block_k, kv_only_mask=kv_only_mask,
        )
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [BK, D]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = delta_ref[0, 0][:, :1]
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dk_scr[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )                                                      # [BK, D]

    @pl.when(iq == n_q - 1)
    def _fin():
        dk_ref[0, 0] = dk_scr[:]
        dv_ref[0, 0] = dv_scr[:]


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "sliding_window", "block_q", "block_k",
                     "kv_only_mask"),
)
def _flash_backward(
    q, k, v, q_seg, kv_seg, out, lse, g,
    *, causal, scale, sliding_window, block_q, block_k, kv_only_mask=False,
):
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    group = hq // hkv
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)

    if lse.shape[-1] == 1:
        # residuals carry the lse lane-slim (see _flash_fwd); the kernels
        # want the 128-replicated layout back
        lse = jnp.broadcast_to(lse, (*lse.shape[:-1], 128))
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    dot_ = g.transpose(0, 2, 1, 3)
    ot = out.transpose(0, 2, 1, 3)
    # delta_i = Σ_d dO_id · O_id — elementwise, cheaper in XLA than in-kernel;
    # lane-replicated to match the lse layout
    delta = jnp.sum(
        dot_.astype(jnp.float32) * ot.astype(jnp.float32), axis=-1
    )
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, 128))

    common = dict(
        scale=scale, causal=causal, sliding_window=sliding_window,
        block_q=block_q, block_k=block_k, kv_only_mask=kv_only_mask,
    )
    seg_q_spec_iq2 = pl.BlockSpec((b, block_q), lambda bb, h, iq, ik: (0, iq),
                                  memory_space=pltpu.VMEM)
    seg_k_spec_ik3 = pl.BlockSpec((b, block_k), lambda bb, h, iq, ik: (0, ik),
                                  memory_space=pltpu.VMEM)

    def qspec(index):
        return pl.BlockSpec((1, 1, block_q, d), index, memory_space=pltpu.VMEM)

    def kspec(index):
        return pl.BlockSpec((1, 1, block_k, d), index, memory_space=pltpu.VMEM)

    def rowspec(index):
        return pl.BlockSpec((1, 1, block_q, 128), index,
                            memory_space=pltpu.VMEM)

    # dq: grid (B, Hq, Sq/BQ, Skv/BK), kv innermost
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **common),
        grid=(b, hq, sq // block_q, skv // block_k),
        in_specs=[
            seg_q_spec_iq2,
            seg_k_spec_ik3,
            qspec(lambda bb, h, iq, ik: (bb, h, iq, 0)),
            kspec(lambda bb, h, iq, ik, gr=group: (bb, h // gr, ik, 0)),
            kspec(lambda bb, h, iq, ik, gr=group: (bb, h // gr, ik, 0)),
            qspec(lambda bb, h, iq, ik: (bb, h, iq, 0)),
            rowspec(lambda bb, h, iq, ik: (bb, h, iq, 0)),
            rowspec(lambda bb, h, iq, ik: (bb, h, iq, 0)),
        ],
        out_specs=qspec(lambda bb, h, iq, ik: (bb, h, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
    )(q_seg, kv_seg, qt, kt, vt, dot_, lse, delta)

    # dk/dv: grid (B, Hq, Skv/BK, Sq/BQ), q innermost; per-q-head partials
    # are group-summed outside (GQA)
    dk_ph, dv_ph = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **common),
        grid=(b, hq, skv // block_k, sq // block_q),
        in_specs=[
            pl.BlockSpec((b, block_q), lambda bb, h, ik, iq: (0, iq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, block_k), lambda bb, h, ik, iq: (0, ik),
                         memory_space=pltpu.VMEM),
            qspec(lambda bb, h, ik, iq: (bb, h, iq, 0)),
            kspec(lambda bb, h, ik, iq, gr=group: (bb, h // gr, ik, 0)),
            kspec(lambda bb, h, ik, iq, gr=group: (bb, h // gr, ik, 0)),
            qspec(lambda bb, h, ik, iq: (bb, h, iq, 0)),
            rowspec(lambda bb, h, ik, iq: (bb, h, iq, 0)),
            rowspec(lambda bb, h, ik, iq: (bb, h, iq, 0)),
        ],
        out_specs=[
            kspec(lambda bb, h, ik, iq: (bb, h, ik, 0)),
            kspec(lambda bb, h, ik, iq: (bb, h, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, skv, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hq, skv, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
    )(q_seg, kv_seg, qt, kt, vt, dot_, lse, delta)

    dk = dk_ph.reshape(b, hkv, group, skv, d).sum(axis=2).astype(k.dtype)
    dv = dv_ph.reshape(b, hkv, group, skv, d).sum(axis=2).astype(v.dtype)
    return (
        dq.transpose(0, 2, 1, 3),
        dk.transpose(0, 2, 1, 3),
        dv.transpose(0, 2, 1, 3),
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11)
)
def _flash(q, k, v, q_seg, kv_seg, causal, scale, sliding_window, block_q,
           block_k, bwd_impl, kv_only_mask):
    out, _ = _flash_forward(
        q, k, v, q_seg, kv_seg,
        causal=causal, scale=scale, sliding_window=sliding_window,
        block_q=block_q, block_k=block_k, save_lse=False,
        kv_only_mask=kv_only_mask,
    )
    return out


def _flash_fwd(q, k, v, q_seg, kv_seg, causal, scale, sliding_window,
               block_q, block_k, bwd_impl, kv_only_mask):
    save_lse = bwd_impl != "chunked"
    out, lse = _flash_forward(
        q, k, v, q_seg, kv_seg,
        causal=causal, scale=scale, sliding_window=sliding_window,
        block_q=block_q, block_k=block_k, save_lse=save_lse,
        kv_only_mask=kv_only_mask,
    )
    # Tag the residuals HERE, inside the forward rule: under a
    # jax.checkpoint policy that saves these names ("attn"/"selective",
    # ops/remat.py), the backward then reuses out/lse instead of re-running
    # the whole flash forward kernel. Tagging only the call-site output
    # (decoder.py's tag_attn_out) does NOT save the rule's residuals — the
    # kernel measurably re-ran in backward until this tag existed. The lse
    # is stored lane-slim ([..., :1] of the kernel's 128-replicated layout,
    # ~1/128 the bytes); _flash_backward re-broadcasts.
    out = tag_attn_out(out)
    if lse is not None:
        lse = tag_flash_lse(lse[..., :1])
    return out, (q, k, v, q_seg, kv_seg, out, lse)


def _flash_bwd(causal, scale, sliding_window, block_q, block_k, bwd_impl,
               kv_only_mask, res, g):
    q, k, v, q_seg, kv_seg, out, lse = res
    if bwd_impl == "chunked":
        from leopard_tpu.ops.chunked_attention import chunked_attention

        def ref_fn(q, k, v):
            return chunked_attention(
                q, k, v, causal=causal,
                q_segment_ids=q_seg, kv_segment_ids=kv_seg,
                sliding_window=sliding_window,
                scale=scale, chunk_size=block_k, remat=True,
            )

        _, vjp = jax.vjp(ref_fn, q, k, v)
        dq, dk, dv = vjp(g)
    else:
        dq, dk, dv = _flash_backward(
            q, k, v, q_seg, kv_seg, out, lse, g,
            causal=causal, scale=scale, sliding_window=sliding_window,
            block_q=block_q, block_k=block_k, kv_only_mask=kv_only_mask,
        )
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
    bwd_impl: str = "flash",
    kv_only_mask: bool = False,
) -> jnp.ndarray:
    """Flash attention on TPU. q: [B, Sq, Hq, D]; k/v: [B, Skv, Hkv, D].

    `sliding_window` masks q_pos - k_pos >= window (Mistral semantics,
    reference window arg: megatron_patch/model/idefics2/idefics_vlm_model.py:388)
    and skips kv blocks fully outside the band. `bwd_impl` selects the
    gradient path: "flash" (Pallas dq + dk/dv kernels) or "chunked" (XLA
    blockwise remat). `kv_only_mask=True` declares the segment ids to be a
    0/1 validity mask with valid tokens forming a PREFIX of each row (not
    multi-segment packing): masking reduces to an invalid-kv column bias,
    causal/window band masks run only on blocks the band edge crosses, and
    fully-invalid q rows return don't-care values (callers must discard
    them)."""
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
        int(block_q), int(block_k), bwd_impl, bool(kv_only_mask),
    )
