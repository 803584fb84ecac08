"""Speculative decoding on TPU: plain greedy decode vs prompt-lookup
speculative decode, token-equality asserted, tok/s + measured tokens-per-
verify-round reported.

Acceptance depends on how much the greedy continuation quotes its own
history. Two workloads bound the range:
  - `--workload loop`: the prompt ends with a repeating token pattern, so
    greedy decode (random weights or real ones) tends to continue the loop
    and the n-gram drafts hit — the upper end, standing in for the
    quote-heavy text-VQA answers this framework targets.
  - `--workload random`: an incompressible random prompt — the adversarial
    floor, measuring pure speculation OVERHEAD when nothing is accepted.

Usage: python tools/bench_spec.py [--batch 1] [--new 128] [--prompt 512]
       [--int8] [--draft 7] [--workload loop|random|both]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--draft", type=int, default=7)
    ap.add_argument("--ngram", type=int, default=2)
    ap.add_argument("--workload", default="both",
                    choices=("loop", "random", "both"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from __graft_entry__ import _flagship_single_chip_cfg
    from leopard_tpu.config import GenerateConfig
    from leopard_tpu.inference.engine import Engine
    from leopard_tpu.inference.speculative import SpecConfig
    from leopard_tpu.models import vlm

    cfg = _flagship_single_chip_cfg()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    engine = Engine(
        cfg, params, seq_buckets=(args.prompt,), tile_buckets=(0,),
        quantize="int8" if args.int8 else None, quantize_kv=args.int8,
    )
    gen = GenerateConfig(max_new_tokens=args.new, greedy=True,
                         eos_token_ids=(999999,))
    spec = SpecConfig(ngram=args.ngram, draft=args.draft)

    rng = np.random.RandomState(0)

    def prompts_for(workload):
        out = []
        for _ in range(args.batch):
            p = rng.randint(1, 1000, args.prompt - 8).astype(np.int32)
            if workload == "loop":
                # trailing repeated pattern: greedy decode locks onto the
                # loop and the n-gram lookup drafts it correctly
                pat = rng.randint(1, 1000, 6).astype(np.int32)
                p[-180:] = np.tile(pat, 30)
            out.append(p)
        return out

    workloads = (("loop", "random") if args.workload == "both"
                 else (args.workload,))
    for workload in workloads:
        prompts = prompts_for(workload)

        # compile + verify token equality once per workload
        plain = engine.generate(prompts, gen_cfg=gen)
        fast = engine.generate(prompts, gen_cfg=gen, spec=spec)
        for i, (w, g) in enumerate(zip(plain.tokens, fast.tokens)):
            np.testing.assert_array_equal(g, w, err_msg=f"row {i}")

        rows = {}
        for name, kw in (("plain", {}), ("spec", {"spec": spec})):
            t0 = time.perf_counter()
            res = engine.generate(prompts, gen_cfg=gen, **kw)
            dt = time.perf_counter() - t0
            n_tok = sum(len(t) for t in res.tokens)
            rows[name] = (n_tok / dt, dt, res.spec_rounds)
        tps_p, dt_p, _ = rows["plain"]
        tps_s, dt_s, rounds = rows["spec"]
        # emitted-per-round uses the PRE-TRIM count (args.new per active
        # row), the quantity the loop actually controls
        per_round = args.batch * args.new / max(rounds, 1)
        print(
            f"[{workload:6s}] b{args.batch} {'int8' if args.int8 else 'bf16'}"
            f" +{args.new}tok: plain {tps_p:7.1f} tok/s ({dt_p*1e3:6.0f} ms)"
            f" | spec {tps_s:7.1f} tok/s ({dt_s*1e3:6.0f} ms)"
            f" | speedup {tps_s/tps_p:4.2f}x"
            f" | {rounds} rounds, {per_round:.2f} tok/round",
            flush=True,
        )


if __name__ == "__main__":
    main()
