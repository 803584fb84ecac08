"""Serving throughput + latency: static batching vs continuous batching
(per-slot refill) on a heterogeneous workload — requests with different
response budgets, like a real serving queue. Static batching (the
reference's HF `model.generate` shape,
llava_multiimg_siglip_anyres.py:448-452) runs every batch to its LONGEST
row's budget; continuous batching refills finished slots from the queue, so
short answers never pay for long ones.

Reports throughput AND per-request TTFT p50/p99 (VERDICT r4 item 8):
  - continuous: host-visible first-token time (the fetch that first
    observes the request's token — what a streaming client would get);
  - static: a row's tokens only exist when its whole group's generate()
    returns (the reference's eval loop delivers answers at batch end), so
    TTFT_row = its group's completion time, including queue wait.

`--image-frac F` makes ⌈F·requests⌉ requests multimodal (`--tiles` anyres
tiles each, spread round-robin through the queue) — image requests prefill
at b=1 through the staging pool while text requests block-prefill.

Usage: python tools/bench_serving.py [--requests 32] [--slots 8]
       [--prompt 512] [--int8] [--image-frac 0.25 --tiles 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--int8", action="store_true",
                    help="weight-only int8 + int8 KV cache")
    ap.add_argument("--segment", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--image-frac", type=float, default=0.0,
                    help="fraction of requests carrying images")
    ap.add_argument("--tiles", type=int, default=4,
                    help="anyres tiles per image request")
    ap.add_argument("--prefix", type=int, default=0,
                    help="shared system-prompt tokens: continuous rides the "
                         "KV-cached prefix (Engine.build_prefix); static "
                         "re-prefills header+prompt per group, which is "
                         "what a no-prefix-cache server pays")
    args = ap.parse_args()
    assert not (args.prefix and args.image_frac), \
        "prefix + image workload not combined in this bench"

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from __graft_entry__ import _flagship_single_chip_cfg
    from leopard_tpu.config import GenerateConfig
    from leopard_tpu.inference.continuous import ContinuousEngine, Request
    from leopard_tpu.inference.engine import Engine
    from leopard_tpu.models import vlm

    cfg = _flagship_single_chip_cfg()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    n_img = int(np.ceil(args.image_frac * args.requests))

    # workload: budgets spread 16..256 (mean ~90) — the shape of real eval
    # answers under a generous cap; no eos (random weights), so each row
    # decodes exactly its budget. The token-count accounting is identical
    # for both strategies by construction. With --image-frac, every
    # `stride`-th request carries `--tiles` anyres tiles whose image-token
    # block replaces the head of the prompt.
    rng = np.random.RandomState(args.seed)
    budgets = np.clip(
        (16 * np.exp(rng.randn(args.requests) * 0.9 + 1.0)).astype(int),
        16, 256,
    )
    tok_per_tile = cfg.anyres.tokens_per_tile
    n_img_tok = args.tiles * tok_per_tile
    if n_img:
        assert n_img_tok + 16 <= args.prompt, (
            f"{args.tiles} tiles need {n_img_tok} image tokens; raise "
            f"--prompt or lower --tiles"
        )
    img_every = max(1, args.requests // max(n_img, 1))
    reqs = []
    for i in range(args.requests):
        p = rng.randint(1, 1000,
                        args.prompt - int(rng.randint(0, 32))).astype(np.int32)
        images = None
        if n_img and i % img_every == 0 and sum(
            r.images is not None for r in reqs
        ) < n_img:
            p[8 : 8 + n_img_tok] = cfg.image_token_id
            images = rng.randn(args.tiles, 3, cfg.anyres.tile_size,
                               cfg.anyres.tile_size).astype(np.float32)
        reqs.append(Request(prompt=p, max_new_tokens=int(budgets[i]),
                            images=images))
    cache_len = ((args.prefix + args.prompt + 256) + 511) // 512 * 512
    total_tokens = int(budgets.sum())
    # tile buckets: b=1 staging-pool prefills use `tiles`; static groups may
    # hold several image requests, so add the largest per-group tile count
    if n_img:
        group_tiles = max(
            sum(args.tiles for r in reqs[i : i + args.slots]
                if r.images is not None)
            for i in range(0, len(reqs), args.slots)
        )
        tile_buckets = tuple(sorted({args.tiles, group_tiles}))
    else:
        tile_buckets = (0,)
    seq_buckets = ((args.prompt,) if not args.prefix
                   else (args.prompt, args.prefix + args.prompt))
    engine = Engine(
        cfg, params, seq_buckets=seq_buckets, tile_buckets=tile_buckets,
        quantize="int8" if args.int8 else None, quantize_kv=args.int8,
    )
    prefix = None
    pre_ids = None
    if args.prefix:
        pre_ids = rng.randint(1, 1000, args.prefix).astype(np.int32)
        t0 = time.perf_counter()
        prefix = engine.build_prefix(pre_ids)
        np.asarray(prefix.cache.index)
        print(f"prefix built once: {args.prefix} tokens, "
              f"{time.perf_counter() - t0:.1f} s (incl. compile)")
    print(f"{args.requests} requests ({sum(r.images is not None for r in reqs)}"
          f" with {args.tiles} tiles), prompt bucket {args.prompt}, budgets "
          f"16..256 (sum {total_tokens}), slots {args.slots}, "
          f"{'int8' if args.int8 else 'bf16'}")

    gen = GenerateConfig(greedy=True, eos_token_ids=(999999,))

    # ---- static batching: batches of `slots`, each to its max budget ----
    def run_static():
        done_tokens = 0
        ttfts = []
        t0 = time.perf_counter()
        for i in range(0, len(reqs), args.slots):
            group = reqs[i : i + args.slots]
            g = GenerateConfig(
                max_new_tokens=max(r.max_new_tokens for r in group),
                greedy=True, eos_token_ids=(999999,),
            )
            with_px = [r.images for r in group if r.images is not None]
            px = np.concatenate(with_px, axis=0) if with_px else None
            # static = no prefix cache: the shared header is re-prefilled
            # inside every group's prompt (what the reference's loop pays)
            ids = [r.prompt if pre_ids is None
                   else np.concatenate([pre_ids, r.prompt]) for r in group]
            res = engine.generate(ids, images=px,
                                  gen_cfg=g, max_cache=cache_len)
            # host-side per-row budget trim (static batching can't stop rows)
            done_tokens += sum(
                min(len(t), r.max_new_tokens)
                for t, r in zip(res.tokens, group)
            )
            # every row's answer materializes when its group returns
            ttfts += [time.perf_counter() - t0] * len(group)
        return done_tokens, ttfts

    # ---- continuous batching ----
    cont = ContinuousEngine(engine, slots=args.slots, cache_len=cache_len,
                            max_new_cap=256, segment_steps=args.segment)

    def run_continuous(longest_first=False):
        # longest-first admission: the offline/batch-serving makespan
        # heuristic (every request is present up front, so FCFS fairness
        # costs nothing to trade away)
        out = cont.run(reqs, gen_cfg=gen, longest_first=longest_first,
                       prefix=prefix)
        return (sum(len(c.tokens) for c in out),
                [cont.ttft[i] for i in sorted(cont.ttft)])

    # best-of-N: the TPU relay's throughput drifts ±30% minute-to-minute
    # (identical schedules — same segment/block counts — time 1.57-2.10 s
    # across runs), so a single timing is unreliable. Best-of filters the
    # relay's bad minutes; every strategy gets the same treatment. TTFT
    # percentiles come from the best rep (same filtering).
    for name, fn in (("static", run_static),
                     ("continuous", run_continuous),
                     ("cont (ljf)", lambda: run_continuous(True))):
        fn()  # compile
        best, best_ttfts = float("inf"), []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            n, ttfts = fn()
            dt = time.perf_counter() - t0
            assert n == total_tokens, (name, n, total_tokens)
            if dt < best:
                best, best_ttfts = dt, ttfts
        p50, p99 = np.percentile(best_ttfts, [50, 99])
        print(f"  {name:11s}: {best:6.2f} s  {n / best:8.1f} gen tok/s  "
              f"TTFT p50 {p50 * 1e3:6.0f} ms  p99 {p99 * 1e3:6.0f} ms "
              f"(best of {args.reps})", flush=True)
        if name.startswith("cont"):
            print(f"    stats: {cont.stats}", flush=True)


if __name__ == "__main__":
    main()
