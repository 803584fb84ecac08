"""Prompt-lookup speculative decoding: n-gram drafts + one-pass verification.

Decode is HBM-bandwidth-bound (see STATUS_R3's roofline table: every step
reads all weights to emit ONE token per row). Speculative decoding amortizes
that read: draft k candidate tokens, run ONE forward over k+1 positions
(weights are read once, the MXU does k+1 columns of work for the same HBM
traffic), and keep the longest prefix the model itself would have produced —
output is TOKEN-IDENTICAL to plain greedy decode by construction in exact
arithmetic. One bf16 caveat (shared by every speculative implementation,
e.g. vLLM's): the verify forward runs at width k+1 while plain decode runs
at width 1, and the two round differently on the MXU (~0.06 logit delta
measured on the 1.5B profile, tools/diag_spec_numerics.py) — so greedy
picks can flip where the top-2 logit margin is below that noise floor.
On real checkpoints confident tokens carry margins orders of magnitude
above it; on random init (margins ~1e-4) ties flip freely, which is why
the on-chip bench asserts margin-aware agreement while the CPU tests
(f32-deterministic across widths) assert exact identity.

Drafts come from PROMPT LOOKUP (n-gram continuation): find the most recent
earlier occurrence of the last `ngram` tokens in (prompt + generated so far)
and propose the tokens that followed it. No draft model, no extra weights,
no training — and it shines exactly on this framework's headline workload:
text-rich multi-image QA (the reference's 12 benchmarks,
/root/reference/evaluations/ — DocVQA/ChartQA-style answers quote spans of
OCR'd prompt text), plus summarization/multi-turn serving.

The reference has no speculative path at all (its eval loop is plain HF
`model.generate`, evaluations/models/llava_multiimg_siglip_anyres.py:448-452);
this module is a beyond-reference serving feature.

TPU design notes:
  - the whole loop (propose → verify forward → accept → cache fixup) is ONE
    jitted `lax.while_loop`; nothing syncs to host per round.
  - the n-gram search is a vectorized compare over a [B, Hs] history buffer
    (a few µs next to the verify matmuls); drafting is a gather.
  - verification reuses the decoder's cached-attention path with S = k+1
    (dense masked sweep over the cache — O((k+1)·S_max), same tier a plain
    decode step uses at S = 1).
  - cache rollback is metadata-only: rejected slots get seg=0 and the write
    index rewinds (slot == absolute position, so the next round's writes
    simply overwrite the junk KV). No KV bytes move on rollback.
  - greedy only: sampled speculative decoding needs rejection-sampling
    bookkeeping that changes the RNG stream (output would no longer match
    `Engine.generate`); eval/serving decode here is greedy anyway.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from leopard_tpu.config import GenerateConfig, VLMConfig
from leopard_tpu.models import vlm


@dataclasses.dataclass(frozen=True)
class SpecConfig:
    """Prompt-lookup speculative decoding parameters.

    ngram: match length for the history lookup (2 is standard: long enough
      to avoid spurious matches, short enough to fire often).
    draft: tokens proposed per round; each round's verify forward runs
      draft+1 positions. 7 → 8-token forwards (lane-friendly) and up to 8
      tokens emitted per weight read.
    """

    ngram: int = 2
    draft: int = 7


def _propose(hist, total, ngram: int, k: int):
    """Draft k tokens by continuing the most recent earlier occurrence of
    the last `ngram` tokens of each row's history.

    hist: [B, Hs] int32 — prompt + generated tokens, contiguous per row.
    total: [B] int32 — valid length of each row's history.
    Returns [B, k] int32 drafts (a repeat of the last token when no match —
    acceptance then simply measures 0 and the round degrades to a plain
    decode step).
    """
    b, hs = hist.shape
    j = jnp.arange(ngram, dtype=jnp.int32)[None, :]
    key_idx = jnp.maximum(total[:, None] - ngram + j, 0)
    key = jnp.take_along_axis(hist, key_idx, axis=1)            # [B, g]

    n_win = hs - ngram
    m = jnp.ones((b, n_win), jnp.bool_)
    for g in range(ngram):
        m = m & (hist[:, g : g + n_win] == key[:, g : g + 1])
    idx = jnp.arange(n_win, dtype=jnp.int32)[None, :]
    # a match must be a strictly EARLIER occurrence (the suffix itself ends
    # at total, i.e. starts at total-g) and the row needs ≥ g+1 tokens
    valid = (idx < (total - ngram)[:, None]) & (total >= ngram + 1)[:, None]
    score = jnp.where(m & valid, idx, -1)
    istar = jnp.max(score, axis=1)                              # [B]
    found = istar >= 0

    src = jnp.where(found, istar + ngram, 0)[:, None] + jnp.arange(
        k, dtype=jnp.int32
    )[None, :]
    draft = jnp.take_along_axis(hist, jnp.clip(src, 0, hs - 1), axis=1)
    return jnp.where(found[:, None], draft, key[:, -1:])


@partial(
    jax.jit,
    static_argnames=("cfg", "gen_cfg", "max_new_tokens", "ngram", "k"),
    donate_argnames=("cache",),
)
def _spec_decode(params, cfg: VLMConfig, gen_cfg: GenerateConfig,
                 first_logits, hist0, hist_len, cache,
                 max_new_tokens: int, ngram: int, k: int):
    """Greedy speculative decode loop. Same contract as engine._decode plus
    a trailing round counter: returns (gen_buf, gen_mask, lp_buf, final
    cache, n_rounds). n_rounds is the number of verify forwards run —
    emitted_tokens / n_rounds is the measured speculation gain (1.0 =
    nothing accepted, draft+1 = every draft accepted). gen_buf rows may run
    past an eos token (the whole accepted block is recorded); the engine's
    host-side trim cuts at the first eos, so results match plain decode."""
    b = first_logits.shape[0]
    eos = jnp.asarray(gen_cfg.eos_token_ids, jnp.int32)
    positions = jnp.arange(max_new_tokens, dtype=jnp.int32)[None, :]
    kj = jnp.arange(k + 1, dtype=jnp.int32)[None, :]

    def emit(gen_buf, gen_mask, lp_buf, hist, n_gen, toks, lps, n_emit):
        """Append each row's first n_emit of toks [B, W] to the output
        buffers and the history. One-hot scatters keep shapes static."""
        w = toks.shape[1]
        tgt = n_gen[:, None] + jnp.arange(w, dtype=jnp.int32)[None, :]
        keep = jnp.arange(w, dtype=jnp.int32)[None, :] < n_emit[:, None]
        onehot = (positions[:, :, None] == tgt[:, None, :]) & keep[:, None, :]
        hit = jnp.any(onehot, 2)
        gen_buf = jnp.where(
            hit,
            jnp.einsum("bsw,bw->bs", onehot.astype(jnp.int32), toks),
            gen_buf,
        )
        gen_mask = gen_mask | hit
        lp_buf = jnp.where(
            hit,
            jnp.einsum("bsw,bw->bs", onehot.astype(lps.dtype), lps),
            lp_buf,
        )
        hpos = jnp.arange(hist.shape[1], dtype=jnp.int32)[None, :]
        htgt = hist_len[:, None] + tgt
        honehot = (hpos[:, :, None] == htgt[:, None, :]) & keep[:, None, :]
        hist = jnp.where(
            jnp.any(honehot, 2),
            jnp.einsum("bsw,bw->bs", honehot.astype(jnp.int32), toks),
            hist,
        )
        return gen_buf, gen_mask, lp_buf, hist, n_gen + n_emit

    # first token comes from the prefill logits (its KV is not cached yet —
    # it is the next round's verify input t0)
    tok0 = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)
    lp0 = jnp.take_along_axis(
        jax.nn.log_softmax(first_logits.astype(jnp.float32), -1),
        tok0[:, None], 1,
    )[:, 0]
    gen_buf = jnp.zeros((b, max_new_tokens), jnp.int32)
    gen_mask = jnp.zeros((b, max_new_tokens), jnp.bool_)
    lp_buf = jnp.zeros((b, max_new_tokens), jnp.float32)
    n_gen0 = jnp.zeros((b,), jnp.int32)
    gen_buf, gen_mask, lp_buf, hist, n_gen = emit(
        gen_buf, gen_mask, lp_buf, hist0, n_gen0,
        tok0[:, None], lp0[:, None], jnp.ones((b,), jnp.int32),
    )
    done0 = jnp.any(tok0[:, None] == eos[None, :], axis=1) | (
        max_new_tokens <= 1
    )

    def cond(carry):
        i, done = carry[0], carry[4]
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(carry):
        (i, cache, t_last, hist, done, n_gen,
         gen_buf, gen_mask, lp_buf) = carry
        old_index = cache.index
        draft = _propose(hist, hist_len + n_gen, ngram, k)      # [B, k]

        tokens = jnp.concatenate([t_last[:, None], draft], axis=1)
        seg = jnp.where(done, 0, 1)[:, None] * jnp.ones(
            (1, k + 1), jnp.int32
        )
        logits, cache = vlm.forward(
            params, cfg, tokens, segment_ids=seg, cache=cache,
        )                                                        # [B, k+1, V]
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)

        ok = next_tok[:, :k] == draft                            # [B, k]
        n_acc = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), 1), 1)  # [B] 0..k
        # emitted this round: accepted drafts + the model's own next token
        emit_toks = jnp.where(kj < n_acc[:, None],
                              jnp.concatenate(
                                  [draft, draft[:, -1:]], axis=1),
                              next_tok)                          # [B, k+1]
        emit_lps = jnp.take_along_axis(logp, emit_toks[:, :, None], 2)[..., 0]
        budget_left = max_new_tokens - n_gen
        n_emit = jnp.where(done, 0, jnp.minimum(n_acc + 1, budget_left))

        gen_buf, gen_mask, lp_buf, hist, n_gen = emit(
            gen_buf, gen_mask, lp_buf, hist, n_gen,
            emit_toks, emit_lps, n_emit,
        )

        # cache fixup (metadata only): keep t_last + the accepted drafts,
        # invalidate the rest of the written window and rewind the index
        keep = jnp.where(done, 0, jnp.minimum(n_acc + 1, budget_left))
        spos = jnp.arange(cache.seg.shape[1], dtype=jnp.int32)[None, :]
        written = (spos >= old_index[:, None]) & (
            spos < old_index[:, None] + (k + 1)
        )
        new_seg = jnp.where(
            written & (spos >= (old_index + keep)[:, None]), 0, cache.seg
        )
        cache = dataclasses.replace(
            cache, seg=new_seg, index=old_index + keep
        )

        hit_eos = jnp.any(
            (emit_toks[:, :, None] == eos[None, None, :])
            & (kj < n_emit[:, None])[:, :, None],
            axis=(1, 2),
        )
        done = done | hit_eos | (n_gen >= max_new_tokens)
        t_last = emit_toks[
            jnp.arange(b), jnp.maximum(n_emit - 1, 0)
        ]
        return (i + 1, cache, t_last, hist, done, n_gen,
                gen_buf, gen_mask, lp_buf)

    carry = (jnp.int32(1), cache, tok0, hist, done0, n_gen,
             gen_buf, gen_mask, lp_buf)
    carry = jax.lax.while_loop(cond, body, carry)
    i, cache, _, _, _, _, gen_buf, gen_mask, lp_buf = carry
    return gen_buf, gen_mask, lp_buf, cache, i - 1
