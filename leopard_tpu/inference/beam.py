"""Beam-search decoding.

Feature parity with the reference's Megatron beam search
(megatron_patch/generation/generation.py:354 — single-prompt beam search with
length penalty and early stop). Implemented as one `lax.scan` over steps with
the KV cache reordered by gather at every step (beam dim = batch dim).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from leopard_tpu.config import VLMConfig
from leopard_tpu.models import vlm
from leopard_tpu.models.decoder import KVCache

NEG_INF = -1e30


@partial(jax.jit, static_argnames=("cfg", "beam_width", "max_new_tokens",
                                   "length_penalty", "eos_ids"))
def _beam_decode(
    params,
    cfg: VLMConfig,
    first_logits,            # [1, V] from prefill
    cache: KVCache,          # batch == 1 (will be tiled to beam_width)
    beam_width: int,
    max_new_tokens: int,
    length_penalty: float,
    eos_ids: Tuple[int, ...],
):
    v = first_logits.shape[-1]
    w = beam_width
    eos = jnp.asarray(eos_ids, jnp.int32)

    # tile the prefill cache across beams (scales present in int8-KV mode)
    def _rep1(a):
        return jnp.repeat(a, w, axis=1) if a is not None else None

    cache = KVCache(
        kv=_rep1(cache.kv),
        seg=jnp.repeat(cache.seg, w, axis=0),
        index=jnp.repeat(cache.index, w, axis=0),
        kv_scale=_rep1(cache.kv_scale),
    )

    logp0 = jax.nn.log_softmax(first_logits[0].astype(jnp.float32))
    top_lp, top_tok = jax.lax.top_k(logp0, w)                  # [W]
    scores = top_lp
    done = jnp.any(top_tok[:, None] == eos[None, :], axis=1)
    tokens_buf = jnp.zeros((w, max_new_tokens), jnp.int32)
    tokens_buf = tokens_buf.at[:, 0].set(top_tok)

    def step(carry, i):
        cache, scores, done, tokens_buf = carry
        last_tok = jnp.take_along_axis(
            tokens_buf, jnp.maximum(i - 1, 0)[None].repeat(w)[:, None], axis=1
        )
        logits, cache = vlm.forward(
            params, cfg, last_tok,
            segment_ids=jnp.where(done, 0, 1)[:, None].astype(jnp.int32),
            cache=cache,
        )
        logp = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32))  # [W, V]
        # finished beams: only continuation is eos[0] with no score change
        frozen = jnp.full((w, v), NEG_INF).at[:, eos[0]].set(0.0)
        logp = jnp.where(done[:, None], frozen, logp)
        cand = scores[:, None] + logp                            # [W, V]
        flat_scores, flat_idx = jax.lax.top_k(cand.reshape(-1), w)
        beam_idx = flat_idx // v
        tok = (flat_idx % v).astype(jnp.int32)

        # reorder state by winning beams
        def _take1(a):
            return jnp.take(a, beam_idx, axis=1) if a is not None else None

        cache = KVCache(
            kv=_take1(cache.kv),
            seg=jnp.take(cache.seg, beam_idx, axis=0),
            index=jnp.take(cache.index, beam_idx, axis=0),
            kv_scale=_take1(cache.kv_scale),
        )
        tokens_buf = jnp.take(tokens_buf, beam_idx, axis=0).at[:, i].set(tok)
        done = jnp.take(done, beam_idx, axis=0) | jnp.any(
            tok[:, None] == eos[None, :], axis=1
        )
        return (cache, flat_scores, done, tokens_buf), None

    carry = (cache, scores, done, tokens_buf)
    carry, _ = jax.lax.scan(step, carry, jnp.arange(1, max_new_tokens))
    _, scores, done, tokens_buf = carry

    # length-penalized final ranking (count tokens up to first eos)
    is_eos = jnp.isin(tokens_buf, eos)
    first_eos = jnp.where(
        is_eos.any(axis=1), jnp.argmax(is_eos, axis=1), max_new_tokens
    )
    lengths = jnp.maximum(first_eos, 1).astype(jnp.float32)
    final = scores / lengths**length_penalty
    best = jnp.argmax(final)
    return tokens_buf[best], first_eos[best]


def beam_search(
    engine,
    prompt: np.ndarray,
    images: Optional[np.ndarray] = None,
    patch_mask=None,
    beam_width: int = 4,
    max_new_tokens: int = 128,
    length_penalty: float = 1.0,
    eos_ids: Tuple[int, ...] = (128001, 128009),
) -> np.ndarray:
    """Single-prompt beam search via an Engine's prefill. Returns the best
    token sequence (trimmed at eos)."""
    from leopard_tpu.inference.engine import _prefill

    s = engine._bucket(len(prompt), engine.seq_buckets)
    tokens = np.zeros((1, s), np.int32)
    seg = np.zeros((1, s), np.int32)
    tokens[0, : len(prompt)] = prompt
    seg[0, : len(prompt)] = 1
    cache_len = engine._bucket(s + max_new_tokens, engine.seq_buckets)
    cache = KVCache.create(engine.cfg.text, 1, cache_len)
    feats = engine.encode_images(images, patch_mask) if images is not None else None
    first_logits, cache = _prefill(
        engine.params, engine.cfg, jnp.asarray(tokens), jnp.asarray(seg),
        cache, feats, fresh=True,
    )
    toks, n = _beam_decode(
        engine.params, engine.cfg, first_logits, cache,
        int(beam_width), int(max_new_tokens), float(length_penalty),
        tuple(int(e) for e in eos_ids),
    )
    return np.asarray(toks)[: int(n)]
