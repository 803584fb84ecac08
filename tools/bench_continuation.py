"""Continuation-prefill TTFT at the 1.5B profile (VERDICT r2 missing #2 /
next #4 done-criterion): an 8k prompt prefilled as 4k fresh (Pallas flash) +
4k continuation into the live cache, through three continuation tiers:

  - chunked_cont: online-softmax chunk sweep, O(S*chunk) memory (the new
    flash-class tier; decoder.forward routes long continuations here)
  - dense:        the old masked O(S*S_max) sweep (forced via a huge
                  long_seq_threshold) — what every continuation paid before
  - single-shot:  8k fresh flash prefill in one call (the no-cache ceiling;
                  only available when a compiled bucket that large exists)

Also times the ENGINE's over-bucket chunked-prefill loop (generate with an
8k prompt against 4k buckets), which is the product path.

Usage: python tools/bench_continuation.py [--ctx 4096] [--new 4096]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    return np.asarray(x)


def time_prefill(engine_params, cfg, tokens_ctx, tokens_new, cache_len, reps=3):
    """Prefill ctx fresh, then time the continuation prefill of tokens_new."""
    import jax.numpy as jnp

    from leopard_tpu.inference.engine import _prefill
    from leopard_tpu.models.decoder import KVCache

    b = tokens_ctx.shape[0]
    best = float("inf")
    for _ in range(reps):
        cache = KVCache.create(cfg.text, b, cache_len)
        seg_ctx = jnp.ones_like(tokens_ctx)
        first, cache = _prefill(engine_params, cfg, tokens_ctx, seg_ctx,
                                cache, None, fresh=True)
        sync(first)  # cache write settled; don't bill ctx prefill
        t0 = time.perf_counter()
        logits, cache = _prefill(engine_params, cfg, tokens_new,
                                 jnp.ones_like(tokens_new), cache, None,
                                 fresh=False)
        sync(logits)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=4096)
    ap.add_argument("--new", type=int, default=4096)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_single_chip_cfg
    from leopard_tpu.config import GenerateConfig
    from leopard_tpu.inference.engine import Engine
    from leopard_tpu.models import vlm

    cfg = _flagship_single_chip_cfg()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    ctx, new = args.ctx, args.new
    total = ctx + new
    # ×512: the chunked tiers want kv len % chunk == 0 and flash wants
    # lane-aligned (×128) blocks — 512 keeps both at full-width chunks
    cache_len = (total + 128 + 511) // 512 * 512
    rng = np.random.RandomState(0)
    t_ctx = jnp.asarray(rng.randint(1, 1000, (1, ctx)).astype(np.int32))
    t_new = jnp.asarray(rng.randint(1, 1000, (1, new)).astype(np.int32))

    print(f"1.5B profile, ctx={ctx} + new={new} continuation (cache {cache_len})")

    # chunked_cont tier (default routing: new >= long_seq_threshold)
    dt = time_prefill(params, cfg, t_ctx, t_new, cache_len)
    print(f"  chunked_cont continuation: {dt * 1e3:7.1f} ms "
          f"({new / dt:8.0f} tok/s)", flush=True)

    # dense tier (the pre-round-3 path), forced by raising the threshold
    cfg_dense = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, long_seq_threshold=1 << 30))
    dt_d = time_prefill(params, cfg_dense, t_ctx, t_new, cache_len)
    print(f"  dense continuation:        {dt_d * 1e3:7.1f} ms "
          f"({new / dt_d:8.0f} tok/s)  [{dt_d / dt:.2f}x slower]", flush=True)

    # engine over-bucket chunked prefill loop (product path): TTFT for the
    # full 8k prompt against ctx-sized buckets
    # only ctx-sized buckets: the full prompt is ABOVE the largest bucket,
    # which is exactly what routes generate through the chunked-prefill loop
    engine = Engine(cfg, params, seq_buckets=(ctx,), tile_buckets=(0,))
    gen = GenerateConfig(max_new_tokens=1, greedy=True,
                         eos_token_ids=(999999,))
    prompt = [rng.randint(1, 1000, total - 96).astype(np.int32)]
    engine.generate(prompt, gen_cfg=gen)  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = engine.generate(prompt, gen_cfg=gen)
        np.asarray(res.tokens[0])
        best = min(best, time.perf_counter() - t0)
    print(f"  engine {total}-tok prompt via {ctx} buckets: TTFT "
          f"{best * 1e3:.0f} ms ({(total - 96) / best:.0f} tok/s)")


if __name__ == "__main__":
    main()
