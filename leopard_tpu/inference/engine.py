"""Multi-image VLM inference engine: bucketed prefill + KV-cache decode.

Replaces two reference stacks at once (SURVEY.md §1 notes they are disjoint
there): the Megatron-native sampler (megatron_patch/generation/generation.py)
and the HF eval adapter's generate loop
(evaluations/models/llava_multiimg_siglip_anyres.py:448-452). One engine, one
set of weights.

TPU design:
  - static shapes everywhere: prompt lengths and tile counts are rounded up
    to buckets so XLA compiles a small, reusable set of programs.
  - the decode loop is a single `lax.while_loop` over steps (one compiled
    program, no per-token dispatch overhead) with an all-rows-done early
    exit, so a batch stops at its longest answer, not at max_new_tokens.
  - sharding: params are placed by rules (parallel/sharding.py); batch is
    sharded over the data axes, and TP shardings propagate from the params.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from leopard_tpu.config import GenerateConfig, VLMConfig
from leopard_tpu.inference.sampling import sample
from leopard_tpu.models import vlm
from leopard_tpu.models.decoder import KVCache


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("cfg",))
def _encode_images(params, cfg: VLMConfig, pixel_values, patch_mask=None):
    return vlm.encode_images(params, cfg, pixel_values, patch_mask)


@partial(jax.jit, static_argnames=("cfg", "fresh"), donate_argnames=("cache",))
def _prefill(params, cfg: VLMConfig, tokens, seg, cache, image_features=None,
             fresh: bool = False, feat_offsets=None):
    """Returns (last-position logits [B, V], updated cache). Unembedding runs
    only at each row's final valid position (logits_indices). The cache is
    DONATED: at 8B/batch-8 scale the in+out cache copies alone are ~4.6 GB,
    which tipped a 16 GB chip into OOM — callers must thread the returned
    cache and never reuse the argument. `fresh=True` (single-shot prefill
    into a just-created cache — the generate() path) routes attention through
    the fast uncached tiers (Pallas flash on TPU) instead of the dense sweep
    over the cache buffer; continuation chunks (fresh=False, long S) take the
    chunked online-softmax tier. `feat_offsets` [B] maps this chunk's image
    tokens to their global feature rows during chunked prefill."""
    lengths = jnp.sum(seg != 0, axis=1)
    logits, cache = vlm.forward(
        params, cfg, tokens,
        image_features=image_features,
        segment_ids=seg,
        cache=cache,
        logits_indices=jnp.maximum(lengths - 1, 0),
        fresh_cache=fresh,
        feature_row_offsets=feat_offsets,
    )
    return logits[:, 0], cache


@partial(jax.jit, static_argnames=("cfg", "gen_cfg", "max_new_tokens"),
         donate_argnames=("cache",))
def _decode(params, cfg: VLMConfig, gen_cfg: GenerateConfig, first_logits,
            prompt_tokens, prompt_seg, cache, key, max_new_tokens: int):
    """Scan decode loop. Returns (gen_buf, gen_mask, lp_buf, final_cache).
    The final cache is returned (even though most callers drop it) so XLA can
    alias the DONATED input cache straight through the scan carry — without
    an aliasable output the donation is "not usable" and batch-8 decode at 8B
    keeps two cache copies live (~4.6 GB) and OOMs a 16 GB chip."""
    b = first_logits.shape[0]
    eos = jnp.asarray(gen_cfg.eos_token_ids, jnp.int32)

    gen_buf = jnp.zeros((b, max_new_tokens), jnp.int32)
    gen_mask0 = jnp.zeros((b, max_new_tokens), jnp.bool_)
    lp_buf0 = jnp.zeros((b, max_new_tokens), jnp.float32)

    def body(carry):
        i, cache, logits, key, done, gen_buf, gen_mask, lp_buf = carry
        key, sub = jax.random.split(key)
        tok = sample(
            logits, sub, gen_cfg,
            prev_tokens=jnp.concatenate([prompt_tokens, gen_buf], axis=1),
            prev_mask=jnp.concatenate([prompt_seg != 0, gen_mask], axis=1),
        )
        is_eos = jnp.any(tok[:, None] == eos[None, :], axis=1)
        tok = jnp.where(done, eos[0], tok)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok_lp = jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0]
        gen_buf = jax.lax.dynamic_update_slice_in_dim(
            gen_buf, tok[:, None], i, axis=1
        )
        gen_mask = jax.lax.dynamic_update_slice_in_dim(
            gen_mask, (~done)[:, None], i, axis=1
        )
        lp_buf = jax.lax.dynamic_update_slice_in_dim(
            lp_buf, jnp.where(done, 0.0, tok_lp)[:, None], i, axis=1
        )
        new_done = done | is_eos
        step_logits, cache = vlm.forward(
            params, cfg, tok[:, None],
            segment_ids=jnp.where(done, 0, 1)[:, None].astype(jnp.int32),
            cache=cache,
        )
        return (i + 1, cache, step_logits[:, 0], key, new_done,
                gen_buf, gen_mask, lp_buf)

    def cond(carry):
        i, _, _, _, done, _, _, _ = carry
        # EARLY EXIT: a batch where every row has emitted eos stops decoding
        # instead of burning the remaining max_new_tokens steps (the
        # reference's HF generate loop has the same early stop). With real
        # checkpoints answers are typically 10-30 tokens against a 128-token
        # cap, so this bounds eval decode time by the LONGEST answer in the
        # batch, not the cap.
        return (i < max_new_tokens) & ~jnp.all(done)

    done0 = jnp.zeros((b,), jnp.bool_)
    carry = (jnp.int32(0), cache, first_logits, key, done0,
             gen_buf, gen_mask0, lp_buf0)
    carry = jax.lax.while_loop(cond, body, carry)
    _, cache, _, _, _, gen_buf, gen_mask, lp_buf = carry
    return gen_buf, gen_mask, lp_buf, cache


@dataclasses.dataclass
class Prefix:
    """A prefilled, reusable prompt prefix (system prompt / few-shot header).

    KV for the prefix is computed ONCE (single-row prefill) and seeded into
    every row of a batch cache at generate(prefix=...) time — requests then
    prefill only their suffix (vLLM-class prefix caching; no reference
    equivalent — the reference re-prefills the full prompt per batch,
    evaluations/models/llava_multiimg_siglip_anyres.py:364-452). Works
    because the cache invariant is slot == absolute position: seeding rows
    with the prefix KV and index=length makes the suffix land at positions
    [length, length+s) with correct RoPE and causal masking for free."""
    cache: KVCache           # batch-1 cache holding slots [0, bucket(P))
    length: int              # P — real prefix tokens
    tokens: np.ndarray       # the prefix ids (for clients that need them)


@partial(jax.jit, static_argnames=("sp_keep",), donate_argnames=("cache",))
def _seed_prefix(cache: KVCache, pre: KVCache, p_len, sp_keep: int):
    """Broadcast the single-row prefix cache into every row of `cache` and
    set per-row fill index to the prefix length. Only the first `sp_keep`
    prefix slots are copied (≥ p_len; the prefix bucket may be larger than
    the target cache); slots in [p_len, sp_keep) carry seg=0 (masked) and
    are overwritten by the suffix prefill."""
    b = cache.kv.shape[1]

    def put(big, small, slot_axis):
        small = jax.lax.slice_in_dim(small, 0, sp_keep, axis=slot_axis)
        tiled = jnp.broadcast_to(small, small.shape[:1] + (b,) + small.shape[2:])
        start = (jnp.zeros((), jnp.int32),) * big.ndim
        return jax.lax.dynamic_update_slice(big, tiled.astype(big.dtype),
                                            start)

    return KVCache(
        kv=put(cache.kv, pre.kv, 2),
        seg=put(cache.seg[None], pre.seg[None], 2)[0],
        index=jnp.full((b,), p_len, jnp.int32),
        kv_scale=(None if cache.kv_scale is None
                  else put(cache.kv_scale, pre.kv_scale, 2)),
    )


@dataclasses.dataclass
class GenerationResult:
    tokens: List[np.ndarray]          # generated ids per row (trimmed at eos)
    prompt_lengths: List[int]
    logprobs: Optional[List[np.ndarray]] = None  # per-token logprob, same trim
    # generate(return_prefix=True): the post-decode KV as a Prefix for the
    # NEXT conversation turn (multi-turn serving without re-prefilling)
    prefix: Optional[Prefix] = None
    # speculative decode only: verify forwards run; raw emitted tokens
    # (pre-trim) / spec_rounds = measured tokens-per-weight-read gain
    spec_rounds: Optional[int] = None


class Engine:
    """Stateless-weights inference engine with shape bucketing."""

    def __init__(
        self,
        cfg: VLMConfig,
        params,
        gen_cfg: Optional[GenerateConfig] = None,
        seq_buckets: Sequence[int] = (256, 512, 1024, 2048, 4096, 8192, 16384),
        tile_buckets: Sequence[int] = (1, 2, 4, 8, 16, 32, 64),
        mesh=None,
        quantize: Optional[str] = None,
        quantize_kv: bool = False,
    ):
        """When `mesh` is given, params are placed by the sharding rules
        (tensor-parallel serving over the "model" axis, batch over "data")
        and the KV cache shards its head dim — multi-chip inference with the
        same code path (≙ the reference's TP=8 generation,
        megatron_patch/generation/). `quantize="int8"` converts the decoder's
        matmul weights to weight-only int8 (≈half the HBM bytes per decode
        step)."""
        self.cfg = cfg
        self.mesh = mesh
        if quantize in ("int8", "int4"):
            from leopard_tpu.ops.quant import quantize_tree

            params = dict(
                params, text=quantize_tree(params["text"], mode=quantize)
            )
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode {quantize}")
        if mesh is not None:
            from leopard_tpu.parallel.sharding import shard_params

            params = shard_params(params, mesh)
        self.params = params
        self.gen_cfg = gen_cfg or GenerateConfig()
        self.seq_buckets = sorted(seq_buckets)
        self.tile_buckets = sorted(tile_buckets)
        self.quantize_kv = quantize_kv

    def _bucket(self, x: int, buckets: Sequence[int]) -> int:
        for bkt in buckets:
            if x <= bkt:
                return bkt
        return round_up(x, buckets[-1])

    def encode_images(self, pixel_values: np.ndarray, patch_mask=None):
        """pixel_values: [N, 3, H, W]. Pads N up to a tile bucket."""
        n = pixel_values.shape[0]
        nb = self._bucket(n, self.tile_buckets)
        if nb != n:
            pad = np.zeros((nb - n,) + pixel_values.shape[1:], pixel_values.dtype)
            pixel_values = np.concatenate([pixel_values, pad], 0)
            if patch_mask is not None:
                mpad = np.zeros((nb - n,) + patch_mask.shape[1:], patch_mask.dtype)
                patch_mask = np.concatenate([patch_mask, mpad], 0)
        feats = _encode_images(
            self.params, self.cfg, jnp.asarray(pixel_values),
            jnp.asarray(patch_mask) if patch_mask is not None else None,
        )
        return feats  # [NB, T, H]; rows ≥ n are unused by the splice gather

    def build_prefix(
        self,
        prompt: np.ndarray,
        images: Optional[np.ndarray] = None,
        patch_mask: Optional[np.ndarray] = None,
    ) -> Prefix:
        """Prefill a shared prompt prefix ONCE for reuse across generate()
        calls (system prompt, few-shot header, shared document — may include
        images: their features splice during this prefill and live in the
        KV like any other position)."""
        prompt = np.asarray(prompt, np.int32)
        s = self._bucket(len(prompt), self.seq_buckets)
        tokens = np.zeros((1, s), np.int32)
        seg = np.zeros((1, s), np.int32)
        tokens[0, : len(prompt)] = prompt
        seg[0, : len(prompt)] = 1
        feats = None
        if images is not None and images.shape[0] > 0:
            feats = self.encode_images(images, patch_mask)
        cache = KVCache.create(self.cfg.text, 1, round_up(s, 512),
                               quantized=self.quantize_kv)
        _, cache = _prefill(self.params, self.cfg, jnp.asarray(tokens),
                            jnp.asarray(seg), cache, feats, fresh=True)
        return Prefix(cache=cache, length=len(prompt), tokens=prompt)

    def generate(
        self,
        prompts: Sequence[np.ndarray],
        images: Optional[np.ndarray] = None,        # [N_tiles, 3, H, W], batch-ordered
        patch_mask: Optional[np.ndarray] = None,
        gen_cfg: Optional[GenerateConfig] = None,
        max_cache: Optional[int] = None,
        spec=None,                                  # SpecConfig → speculative decode
        prefix: Optional[Prefix] = None,            # shared prefilled prefix
        return_prefix: bool = False,                # b=1: hand back the
        #                                 post-decode KV as the next turn's
        #                                 prefix (multi-turn chat)
    ) -> GenerationResult:
        gen_cfg = gen_cfg or self.gen_cfg
        if return_prefix:
            assert len(prompts) == 1 and spec is None, (
                "return_prefix is for single-row conversations without "
                "speculative decoding"
            )
        if spec is not None:
            assert gen_cfg.greedy and gen_cfg.repetition_penalty == 1.0, (
                "speculative decoding is greedy-only (inference/speculative.py)"
            )
        if prefix is not None:
            assert spec is None, (
                "prefix caching + speculative decode not supported (the "
                "n-gram history buffer would need the prefix tokens)"
            )
            assert gen_cfg.repetition_penalty == 1.0, (
                "repetition_penalty scans only the suffix tokens; with a "
                "prefix the penalty would silently ignore prefix tokens"
            )
        b = len(prompts)
        lengths = [len(p) for p in prompts]
        s = self._bucket(max(lengths), self.seq_buckets)
        tokens = np.zeros((b, s), np.int32)
        seg = np.zeros((b, s), np.int32)
        for i, p in enumerate(prompts):
            tokens[i, : len(p)] = p
            seg[i, : len(p)] = 1

        # Cache length: round to 512 (the chunked tiers need kv len % 512
        # == 0, and it keeps the flash/lane tiling) rather than to the next
        # seq bucket — bucketing s+new to a bucket boundary can nearly
        # DOUBLE the KV allocation (a 2048-prompt + 128 new tokens would
        # get a 4096-slot cache), which is what bounds the eval batch size
        # on a 16 GB chip at the 8B profile. Program count stays bounded:
        # cache_len is a function of the (already bucketed) s.
        # Speculative decode needs verify-block headroom: the last verify
        # forward writes draft+1 KV slots starting at index len+n_gen-1, so
        # without +draft the final round's per-row DUS start CLAMPS and
        # silently overwrites the newest valid KV — tokens near max_new then
        # diverge from plain greedy (ADVICE r3, verified at prompt==bucket).
        spec_pad = spec.draft if spec is not None else 0
        p_len = prefix.length if prefix is not None else 0
        cache_len = max_cache or round_up(
            p_len + s + gen_cfg.max_new_tokens + spec_pad, 512
        )
        if spec is not None and max_cache is not None:
            assert max_cache >= s + gen_cfg.max_new_tokens + spec.draft, (
                f"max_cache {max_cache} leaves no verify-block headroom for "
                f"speculative decode (need >= {s + gen_cfg.max_new_tokens + spec.draft})"
            )
        if prefix is not None:
            assert cache_len >= p_len + s + gen_cfg.max_new_tokens, (
                f"cache_len {cache_len} < prefix {p_len} + suffix bucket {s} "
                f"+ max_new {gen_cfg.max_new_tokens}"
            )
        cache = KVCache.create(self.cfg.text, b, cache_len,
                               quantized=self.quantize_kv)
        if prefix is not None:
            sp_keep = min(round_up(p_len, 512), prefix.cache.kv.shape[2],
                          cache_len)
            cache = _seed_prefix(cache, prefix.cache,
                                 jnp.int32(p_len), sp_keep)

        feats = None
        if images is not None and images.shape[0] > 0:
            feats = self.encode_images(images, patch_mask)

        chunk = self.seq_buckets[-1]
        if s <= chunk:
            # with a seeded prefix the suffix is a CONTINUATION prefill
            # (fresh=False): attention runs against the existing cache and
            # positions come from the per-row index (= prefix length)
            first_logits, cache = _prefill(
                self.params, self.cfg, jnp.asarray(tokens), jnp.asarray(seg),
                cache, feats, fresh=prefix is None,
            )
        else:
            # CHUNKED prefill for prompts above the largest bucket: each
            # chunk-sized slice prefills against the growing cache (the first
            # chunk flash-tier, later ones through the chunked continuation
            # tier — decoder attn_impl="chunked_cont"), so arbitrary prompt
            # lengths reuse the same compiled programs instead of compiling
            # one dense O(S²) program per over-bucket length.
            is_img = tokens == self.cfg.image_token_id
            img_cum = np.cumsum(is_img, axis=1)          # [b, s] inclusive
            row_total = img_cum[:, -1]
            global_base = np.concatenate(
                [[0], np.cumsum(row_total)[:-1]]
            ).astype(np.int32)
            lengths_arr = np.asarray(lengths)
            final_chunk = (np.maximum(lengths_arr, 1) - 1) // chunk
            first_logits = None
            for j in range(s // chunk):
                sl = slice(j * chunk, (j + 1) * chunk)
                offs = global_base + (
                    img_cum[:, j * chunk - 1].astype(np.int32) if j else 0
                )
                logits_j, cache = _prefill(
                    self.params, self.cfg,
                    jnp.asarray(tokens[:, sl]), jnp.asarray(seg[:, sl]),
                    cache, feats, fresh=(j == 0 and prefix is None),
                    feat_offsets=jnp.asarray(offs) if feats is not None else None,
                )
                # keep the logits from the chunk holding each row's last token
                pick = jnp.asarray(final_chunk == j)
                first_logits = logits_j if first_logits is None else jnp.where(
                    pick[:, None], logits_j, first_logits
                )
        if spec is not None:
            from leopard_tpu.inference.speculative import _spec_decode

            # history buffer: prompt left-packed, generated tokens appended
            # contiguously per row (n-gram lookup source)
            hist0 = np.zeros((b, s + gen_cfg.max_new_tokens), np.int32)
            hist0[:, :s] = tokens
            gen_buf, gen_mask, lp_buf, _, spec_rounds = _spec_decode(
                self.params, self.cfg, gen_cfg, first_logits,
                jnp.asarray(hist0), jnp.asarray(lengths, dtype=jnp.int32),
                cache, gen_cfg.max_new_tokens, spec.ngram, spec.draft,
            )
        else:
            gen_buf, gen_mask, lp_buf, cache = _decode(
                self.params, self.cfg, gen_cfg, first_logits,
                jnp.asarray(tokens), jnp.asarray(seg), cache,
                jax.random.PRNGKey(gen_cfg.seed), gen_cfg.max_new_tokens,
            )
        # ONE host transfer for all buffers: each separate np.asarray is a
        # device round-trip (~200 ms through a TCP-relayed TPU)
        spec_rounds = spec_rounds if spec is not None else np.int32(0)
        gen_buf, gen_mask, lp_buf, spec_rounds = jax.device_get(
            (gen_buf, gen_mask, lp_buf, spec_rounds)
        )
        out, out_lp = [], []
        for i in range(b):
            row = gen_buf[i][gen_mask[i]]
            lps = lp_buf[i][gen_mask[i]]
            # trim at first eos
            stop = np.isin(row, np.asarray(gen_cfg.eos_token_ids))
            if stop.any():
                n = int(np.argmax(stop))
                row, lps = row[:n], lps[:n]
            out.append(row)
            out_lp.append(lps)
        new_prefix = None
        if return_prefix:
            # the post-decode cache holds prefix + prompt + every emitted
            # token's KV (incl. the eos — seg=1 at its write, a valid
            # turn-end position); the conversation continues from here
            emitted = gen_buf[0][gen_mask[0]]
            p_tokens = (prefix.tokens if prefix is not None
                        else np.zeros((0,), np.int32))
            new_prefix = Prefix(
                cache=cache,
                length=int(p_len + lengths[0] + emitted.size),
                tokens=np.concatenate(
                    [p_tokens, np.asarray(prompts[0], np.int32), emitted]
                ),
            )
        return GenerationResult(
            tokens=out, prompt_lengths=lengths, logprobs=out_lp,
            prefix=new_prefix,
            spec_rounds=int(spec_rounds) if spec is not None else None,
        )
