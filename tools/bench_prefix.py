"""Prefix caching TTFT benefit on the real TPU (1.5B profile).

A serving deployment with a long shared system prompt / few-shot header
(here P tokens) pays its prefill on EVERY request without prefix caching.
With `Engine.build_prefix` the prefix KV is computed once; each request
prefills only its suffix. This reports time-to-first-token per request
batch for both paths (the decode phase is identical by construction —
tests/test_prefix.py proves token parity).

Usage: python tools/bench_prefix.py [--prefix 3584] [--suffix 512]
       [--batch 1 8] [--int8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefix", type=int, default=3584)
    ap.add_argument("--suffix", type=int, default=512)
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_single_chip_cfg
    from leopard_tpu.inference.engine import Engine, KVCache, _prefill, round_up
    from leopard_tpu.models import vlm

    cfg = _flagship_single_chip_cfg()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    eng = Engine(
        cfg, params,
        seq_buckets=(args.suffix, args.prefix + args.suffix),
        tile_buckets=(0,),
        quantize="int8" if args.int8 else None, quantize_kv=args.int8,
    )
    rng = np.random.RandomState(0)
    pre_ids = rng.randint(1, 1000, args.prefix).astype(np.int32)

    t0 = time.perf_counter()
    prefix = eng.build_prefix(pre_ids)
    np.asarray(prefix.cache.index)  # relay-safe sync
    t_build = time.perf_counter() - t0
    print(f"prefix build (once): {t_build * 1e3:.0f} ms for {args.prefix} "
          f"tokens ({'int8' if args.int8 else 'bf16'})")

    def ttft(b, use_prefix):
        """One batch's prefill + first-token time (what a client waits)."""
        sfx = [rng.randint(1, 1000, args.suffix - int(rng.randint(0, 32)))
               .astype(np.int32) for _ in range(b)]
        prompts = (sfx if use_prefix
                   else [np.concatenate([pre_ids, s]) for s in sfx])
        s = eng._bucket(max(len(p) for p in prompts), eng.seq_buckets)
        tokens = np.zeros((b, s), np.int32)
        seg = np.zeros((b, s), np.int32)
        for i, p in enumerate(prompts):
            tokens[i, : len(p)] = p
            seg[i, : len(p)] = 1
        p_len = prefix.length if use_prefix else 0
        cache_len = round_up(p_len + s + 16, 512)

        def once():
            cache = KVCache.create(cfg.text, b, cache_len,
                                   quantized=eng.quantize_kv)
            if use_prefix:
                from leopard_tpu.inference.engine import _seed_prefix

                cache = _seed_prefix(cache, prefix.cache, jnp.int32(p_len),
                                     min(round_up(p_len, 512), cache_len))
            logits, _ = _prefill(eng.params, cfg, jnp.asarray(tokens),
                                 jnp.asarray(seg), cache, None,
                                 fresh=not use_prefix)
            np.asarray(logits[0, :8])  # sync: first token is computable

        once()  # compile
        best = float("inf")
        for _ in range(args.iters):
            t = time.perf_counter()
            once()
            best = min(best, time.perf_counter() - t)
        return best

    for b in args.batch:
        t_full = ttft(b, False)
        t_pref = ttft(b, True)
        print(f"  batch {b}: TTFT full-prefill {t_full * 1e3:7.1f} ms  "
              f"prefix-cached {t_pref * 1e3:7.1f} ms  "
              f"({t_full / t_pref:4.2f}x faster)", flush=True)


if __name__ == "__main__":
    main()
