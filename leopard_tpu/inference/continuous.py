"""Continuous batching: per-slot refill serving on top of the bucketed engine.

The reference's serving story is static batching — HF `model.generate` runs
every row of a batch until the LONGEST row finishes
(evaluations/models/llava_multiimg_siglip_anyres.py:448-452), so short
answers pay for long ones and finished rows burn decode steps emitting
padding. This module keeps a fixed number of decode SLOTS busy instead:

  - decode runs in short jitted segments (a lax.scan of `segment_steps`
    steps) over all slots at once;
  - between segments, finished rows are harvested on the host and refilled
    by prefilling the next queued request into a fresh single-row cache and
    dynamic-update-slicing that row into the batch cache;
  - per-request `max_new_tokens` is honored per row (real serving semantics
    — requests with different budgets coexist in one batch).

TPU design notes: every program here has static shapes (slot count, cache
length, segment length, prompt buckets), so the whole serving loop reuses a
handful of compiled programs. The per-row cache insert moves one row's KV
(L·S·2H·D bytes ≈ 0.2 ms at the 8B/int8 eval shape) — negligible next to a
segment of decode steps. Refill prefills run at batch 1 through the same
bucketed `_prefill` programs the plain engine uses (flash tier, fresh cache).

Constraint: repetition_penalty must be 1.0 in continuous mode — the penalty
needs every row's full token history under one static shape, which conflicts
with slots being refilled at different times (the plain Engine.generate path
still supports it).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from leopard_tpu.config import GenerateConfig, VLMConfig
from leopard_tpu.inference.engine import Engine, _prefill, round_up
from leopard_tpu.inference.sampling import sample
from leopard_tpu.models import vlm
from leopard_tpu.models.decoder import KVCache


@dataclasses.dataclass
class Request:
    prompt: np.ndarray                      # int32 [S]
    max_new_tokens: int
    images: Optional[np.ndarray] = None     # [N, 3, H, W] tiles for this row
    patch_mask: Optional[np.ndarray] = None


@dataclasses.dataclass
class Completion:
    tokens: np.ndarray                      # generated ids, trimmed at eos
    prompt_length: int


def _tree_insert_row(big: KVCache, small: KVCache, row) -> KVCache:
    """Write `small`'s single row into slot `row` of the batch cache."""
    z = jnp.zeros((), jnp.int32)
    kv = jax.lax.dynamic_update_slice(big.kv, small.kv, (z, row, z, z, z))
    seg = jax.lax.dynamic_update_slice(big.seg, small.seg, (row, z))
    index = jax.lax.dynamic_update_slice(big.index, small.index, (row,))
    kv_scale = big.kv_scale
    if kv_scale is not None:
        kv_scale = jax.lax.dynamic_update_slice(
            kv_scale, small.kv_scale, (z, row, z, z)
        )
    return KVCache(kv=kv, seg=seg, index=index, kv_scale=kv_scale)


@partial(jax.jit, donate_argnums=(0,))
def _refill_slot(state: dict, row_cache: KVCache, first_logits, row,
                 budget) -> dict:
    """Install a freshly prefilled request into slot `row`: KV row, first
    logits, cleared done/counter/output buffers, new token budget."""
    onrow = jnp.arange(state["done"].shape[0]) == row
    return dict(
        cache=_tree_insert_row(state["cache"], row_cache, row),
        logits=jnp.where(onrow[:, None], first_logits, state["logits"]),
        # a zero-budget request is born done — otherwise _decode_segment
        # records one token before the budget check fires (ADVICE r3)
        done=jnp.where(onrow, budget <= 0, state["done"]),
        n_gen=jnp.where(onrow, 0, state["n_gen"]),
        budget=jnp.where(onrow, budget, state["budget"]),
        gen_buf=jnp.where(onrow[:, None], 0, state["gen_buf"]),
        gen_mask=jnp.where(
            onrow[:, None], False, state["gen_mask"]
        ),
        key=state["key"],
    )


@partial(jax.jit, static_argnames=("cfg", "gen_cfg", "steps"),
         donate_argnums=(0,))
def _decode_segment(state: dict, params, cfg: VLMConfig,
                    gen_cfg: GenerateConfig, steps: int) -> dict:
    """Run `steps` decode steps for all slots; rows past their budget or
    eos stop advancing (their cache/seg writes are masked out via seg=0)."""
    eos = jnp.asarray(gen_cfg.eos_token_ids, jnp.int32)
    max_new = state["gen_buf"].shape[1]
    positions = jnp.arange(max_new, dtype=jnp.int32)[None, :]

    def step(carry, _):
        cache, logits, key, done, n_gen, budget, gen_buf, gen_mask = carry
        key, sub = jax.random.split(key)
        tok = sample(logits, sub, gen_cfg)
        is_eos = jnp.any(tok[:, None] == eos[None, :], axis=1)
        tok = jnp.where(done, eos[0], tok)
        at = (positions == n_gen[:, None]) & (~done)[:, None]
        gen_buf = jnp.where(at, tok[:, None], gen_buf)
        gen_mask = gen_mask | at
        n_gen = n_gen + (~done).astype(jnp.int32)
        done = done | is_eos | (n_gen >= budget)
        step_logits, cache = vlm.forward(
            params, cfg, tok[:, None],
            segment_ids=jnp.where(done, 0, 1)[:, None].astype(jnp.int32),
            cache=cache,
        )
        return (cache, step_logits[:, 0], key, done, n_gen, budget,
                gen_buf, gen_mask), None

    carry = (state["cache"], state["logits"], state["key"], state["done"],
             state["n_gen"], state["budget"], state["gen_buf"],
             state["gen_mask"])
    carry, _ = jax.lax.scan(step, carry, None, length=steps)
    cache, logits, key, done, n_gen, budget, gen_buf, gen_mask = carry
    return dict(cache=cache, logits=logits, key=key, done=done, n_gen=n_gen,
                budget=budget, gen_buf=gen_buf, gen_mask=gen_mask)


class ContinuousEngine:
    """Fixed-slot continuous-batching server over an Engine's weights."""

    def __init__(
        self,
        engine: Engine,
        slots: int = 8,
        cache_len: int = 2048,
        max_new_cap: int = 512,
        segment_steps: int = 16,
    ):
        self.engine = engine
        self.slots = slots
        self.cache_len = round_up(cache_len, 512)
        self.max_new_cap = max_new_cap
        self.segment_steps = segment_steps

    def _prefill_one(self, req: Request, gen_cfg: GenerateConfig):
        """Prefill one request at batch 1 into a fresh single-row cache."""
        eng = self.engine
        s = eng._bucket(len(req.prompt), eng.seq_buckets)
        tokens = np.zeros((1, s), np.int32)
        seg = np.zeros((1, s), np.int32)
        tokens[0, : len(req.prompt)] = req.prompt
        seg[0, : len(req.prompt)] = 1
        feats = None
        if req.images is not None and req.images.shape[0] > 0:
            feats = eng.encode_images(req.images, req.patch_mask)
        cache = KVCache.create(eng.cfg.text, 1, self.cache_len,
                               quantized=eng.quantize_kv)
        logits, cache = _prefill(
            eng.params, eng.cfg, jnp.asarray(tokens), jnp.asarray(seg),
            cache, feats, fresh=True,
        )
        return logits, cache

    def run(self, requests: Sequence[Request],
            gen_cfg: Optional[GenerateConfig] = None) -> List[Completion]:
        """Serve all requests; returns completions in request order."""
        eng = self.engine
        gen_cfg = gen_cfg or eng.gen_cfg
        assert gen_cfg.repetition_penalty == 1.0, (
            "continuous batching does not support repetition_penalty "
            "(use Engine.generate)"
        )
        for r in requests:
            if r.max_new_tokens > self.max_new_cap:
                import warnings

                warnings.warn(
                    f"request max_new_tokens {r.max_new_tokens} truncated to "
                    f"engine max_new_cap {self.max_new_cap}", stacklevel=2,
                )
            need = len(r.prompt) + min(r.max_new_tokens, self.max_new_cap)
            assert need <= self.cache_len, (
                f"request needs {need} cache slots > cache_len "
                f"{self.cache_len}"
            )

        b = self.slots
        results: List[Optional[Completion]] = [None] * len(requests)
        slot_req = [-1] * b          # request index occupying each slot
        next_req = 0

        state = dict(
            cache=KVCache.create(eng.cfg.text, b, self.cache_len,
                                 quantized=eng.quantize_kv),
            logits=jnp.zeros((b, eng.cfg.text.vocab_size), jnp.float32),
            done=jnp.ones((b,), jnp.bool_),       # empty slots are "done"
            n_gen=jnp.zeros((b,), jnp.int32),
            budget=jnp.zeros((b,), jnp.int32),
            gen_buf=jnp.zeros((b, self.max_new_cap), jnp.int32),
            gen_mask=jnp.zeros((b, self.max_new_cap), jnp.bool_),
            key=jax.random.PRNGKey(gen_cfg.seed),
        )

        def harvest(row: int, buf, mask):
            """Record slot `row`'s finished completion (host-side data)."""
            ri = slot_req[row]
            if ri < 0:
                return
            toks = buf[row][mask[row]]
            stop = np.isin(toks, np.asarray(gen_cfg.eos_token_ids))
            if stop.any():
                toks = toks[: int(np.argmax(stop))]
            results[ri] = Completion(
                tokens=toks, prompt_length=len(requests[ri].prompt)
            )

        while True:
            # ONE host transfer per segment boundary: done flags + output
            # buffers together. Each separate device_get is a full relay
            # round-trip (~50-200 ms) — fetching per finished slot was
            # measured to cost more than the decode segments themselves.
            done_host, buf_host, mask_host = jax.device_get(
                (state["done"], state["gen_buf"], state["gen_mask"])
            )
            free_rows = np.nonzero(np.asarray(done_host))[0]
            for row in free_rows:
                harvest(int(row), buf_host, mask_host)
                slot_req[int(row)] = -1
            # refill free slots from the queue
            for row in free_rows:
                if next_req >= len(requests):
                    break
                req = requests[next_req]
                logits1, row_cache = self._prefill_one(req, gen_cfg)
                budget = min(req.max_new_tokens, self.max_new_cap)
                state = _refill_slot(
                    state, row_cache, logits1, jnp.int32(int(row)),
                    jnp.int32(budget),
                )
                slot_req[int(row)] = next_req
                next_req += 1
            if all(ri < 0 for ri in slot_req) and next_req >= len(requests):
                break
            state = _decode_segment(
                state, eng.params, eng.cfg, gen_cfg, self.segment_steps
            )

        assert all(r is not None for r in results)
        return results
