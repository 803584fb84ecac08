"""Serving throughput: static batching vs continuous batching (per-slot
refill) on a heterogeneous workload — requests with different response
budgets, like a real serving queue. Static batching (the reference's HF
`model.generate` shape, llava_multiimg_siglip_anyres.py:448-452) runs every
batch to its LONGEST row's budget; continuous batching refills finished
slots from the queue, so short answers never pay for long ones.

Usage: python tools/bench_serving.py [--requests 32] [--slots 8]
       [--prompt 512] [--profile 1.5b] [--int8]
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
    args = ap.parse_args()

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
    engine = Engine(
        cfg, params, seq_buckets=(args.prompt,), tile_buckets=(0,),
        quantize="int8" if args.int8 else None, quantize_kv=args.int8,
    )

    # workload: budgets spread 16..256 (mean ~90) — the shape of real eval
    # answers under a generous cap; no eos (random weights), so each row
    # decodes exactly its budget. The token-count accounting is identical
    # for both strategies by construction.
    rng = np.random.RandomState(args.seed)
    budgets = np.clip(
        (16 * np.exp(rng.randn(args.requests) * 0.9 + 1.0)).astype(int),
        16, 256,
    )
    prompts = [
        rng.randint(1, 1000, args.prompt - int(rng.randint(0, 32)))
        .astype(np.int32)
        for _ in range(args.requests)
    ]
    reqs = [Request(prompt=p, max_new_tokens=int(m))
            for p, m in zip(prompts, budgets)]
    cache_len = ((args.prompt + 256) + 511) // 512 * 512
    total_tokens = int(budgets.sum())
    print(f"{args.requests} requests, prompt bucket {args.prompt}, budgets "
          f"16..256 (sum {total_tokens}), slots {args.slots}, "
          f"{'int8' if args.int8 else 'bf16'}")

    gen = GenerateConfig(greedy=True, eos_token_ids=(999999,))

    # ---- static batching: batches of `slots`, each to its max budget ----
    def run_static():
        done_tokens = 0
        for i in range(0, len(reqs), args.slots):
            group = reqs[i : i + args.slots]
            g = GenerateConfig(
                max_new_tokens=max(r.max_new_tokens for r in group),
                greedy=True, eos_token_ids=(999999,),
            )
            res = engine.generate([r.prompt for r in group], gen_cfg=g,
                                  max_cache=cache_len)
            # host-side per-row budget trim (static batching can't stop rows)
            done_tokens += sum(
                min(len(t), r.max_new_tokens)
                for t, r in zip(res.tokens, group)
            )
        return done_tokens

    # ---- continuous batching ----
    cont = ContinuousEngine(engine, slots=args.slots, cache_len=cache_len,
                            max_new_cap=256, segment_steps=args.segment)

    def run_continuous():
        out = cont.run(reqs, gen_cfg=gen)
        return sum(len(c.tokens) for c in out)

    def run_continuous_ljf():
        # longest-first admission: the offline/batch-serving makespan
        # heuristic (every request is present up front, so FCFS fairness
        # costs nothing to trade away)
        out = cont.run(reqs, gen_cfg=gen, longest_first=True)
        return sum(len(c.tokens) for c in out)

    # best-of-N: the TPU relay's throughput drifts ±30% minute-to-minute
    # (identical schedules — same segment/block counts — time 1.57-2.10 s
    # across runs), so a single timing is unreliable. Best-of filters the
    # relay's bad minutes; every strategy gets the same treatment.
    for name, fn in (("static", run_static), ("continuous", run_continuous),
                     ("cont (ljf)", run_continuous_ljf)):
        fn()  # compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            n = fn()
            dt = time.perf_counter() - t0
            assert n == total_tokens, (name, n, total_tokens)
            best = min(best, dt)
        print(f"  {name:11s}: {best:6.2f} s  {n / best:8.1f} gen tok/s "
              f"(best of {args.reps})", flush=True)
        if name.startswith("cont"):
            print(f"    stats: {cont.stats}", flush=True)


if __name__ == "__main__":
    main()
