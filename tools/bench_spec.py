"""Speculative decoding on TPU: plain greedy decode vs prompt-lookup
speculative decode; margin-aware token agreement asserted (exact identity up
to bf16 tie-flips — see the noise-floor comment below and
inference/speculative.py's docstring), tok/s + measured tokens-per-
verify-round reported.

Acceptance depends on how much the greedy continuation quotes its own
history. Three workloads cover the range:
  - `--workload oracle`: the high-acceptance end, measured honestly on
    random-init weights (which have no induction heads, so a pattern in the
    prompt does NOT make greedy decode continue it). The decoder block
    output projections (wo, w_down) are zeroed — dense matmul/attention
    timing is data-independent, so every step costs exactly what the real
    model costs — which makes greedy decode a deterministic token map
    t→argmax(head(norm(emb(t)))); its orbit enters a cycle, the prompt is
    that cycle tiled, and prompt-lookup drafts it perfectly. This is the
    fully-predictable-continuation regime (DocVQA-style quoting) with real
    step costs.
  - `--workload loop`: the prompt ends with a repeating token pattern —
    on random weights greedy only intermittently continues it (measured
    1.25 tok/round), a mid point; on real checkpoints this is the
    quote-heavy regime the oracle workload bounds from above.
  - `--workload random`: an incompressible random prompt — the adversarial
    floor, measuring pure speculation OVERHEAD when nothing is accepted.

Usage: python tools/bench_spec.py [--batch 1] [--new 128] [--prompt 512]
       [--int8] [--draft 7] [--workload oracle|loop|random|both|all]
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
                    choices=("oracle", "loop", "random", "both", "all"))
    ap.add_argument("--profile", default="1.5b", choices=("1.5b", "8b"),
                    help="8b: the real flagship profile, host-built int8 "
                         "decoder weights (implies --int8 KV)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_single_chip_cfg
    from leopard_tpu.config import GenerateConfig
    from leopard_tpu.inference.engine import Engine
    from leopard_tpu.inference.speculative import SpecConfig
    from leopard_tpu.models import vlm

    oracle = args.workload in ("oracle", "all")
    if args.profile == "8b":
        import pickle

        from leopard_tpu import config as cfgs
        from bench_8b import build_host_params

        cfg = cfgs.leopard_llava_8b()
        cache_file = "/tmp/leopard8b_host_params_int8.pkl"
        if os.path.exists(cache_file):
            with open(cache_file, "rb") as f:
                host = pickle.load(f)
        else:
            host = build_host_params(cfg, quantize_text="int8")
            with open(cache_file, "wb") as f:
                pickle.dump(host, f, protocol=4)
        if oracle:
            # zero the quantized block output projections (see below)
            for leafd in (host["text"]["layers"]["attn"]["wo"],
                          host["text"]["layers"]["mlp"]["w_down"]):
                leafd["q"] = np.zeros_like(leafd["q"])
        params = jax.device_put(host)
        jax.block_until_ready(params)
        del host
        engine = Engine(cfg, params, seq_buckets=(args.prompt,),
                        tile_buckets=(0,), quantize=None, quantize_kv=True)
        label = "8b-int8"
    else:
        cfg = _flagship_single_chip_cfg()
        params = vlm.init_params(cfg, jax.random.PRNGKey(0))
        if oracle:
            # zero the block OUTPUT projections: residual stream ==
            # embedding, so greedy decode is the deterministic map
            # t -> f(t). Every matmul still runs at full size — step timing
            # is unchanged.
            txt = params["text"]
            txt["layers"]["attn"]["wo"] = jnp.zeros_like(
                txt["layers"]["attn"]["wo"])
            txt["layers"]["mlp"]["w_down"] = jnp.zeros_like(
                txt["layers"]["mlp"]["w_down"])
        engine = Engine(
            cfg, params, seq_buckets=(args.prompt,), tile_buckets=(0,),
            quantize="int8" if args.int8 else None, quantize_kv=args.int8,
        )
        label = "int8" if args.int8 else "bf16"
    gen = GenerateConfig(max_new_tokens=args.new, greedy=True,
                         eos_token_ids=(999999,))
    spec = SpecConfig(ngram=args.ngram, draft=args.draft)

    rng = np.random.RandomState(0)

    def oracle_cycle(start_tok: int) -> np.ndarray:
        """Greedy decode IS f-iteration when blocks are zeroed; find f's
        cycle by decoding far enough to revisit a token."""
        g = GenerateConfig(max_new_tokens=1024, greedy=True,
                           eos_token_ids=(999999,))
        orbit = np.asarray(engine.generate(
            [np.asarray([start_tok], np.int32)], gen_cfg=g).tokens[0])
        seen = {}
        for i, t in enumerate(orbit.tolist()):
            if t in seen:
                return orbit[seen[t]: i]
            seen[t] = i
        raise RuntimeError("no cycle within 1024 steps — raise the orbit cap")

    def prompts_for(workload):
        if workload == "oracle":
            out = []
            for row in range(args.batch):
                cyc = oracle_cycle(1 + row)
                L = args.prompt - 8
                if 2 * len(cyc) + args.ngram > L:
                    print(f"  (oracle cycle len {len(cyc)} > prompt/2 — "
                          f"lookup warms up only after one generated period)")
                reps = -(-L // len(cyc)) + 1
                p = np.tile(cyc, reps)[-L:].astype(np.int32)
                out.append(p)
            return out
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

    workloads = {
        "both": ("loop", "random"),
        "all": ("oracle", "loop", "random"),
    }.get(args.workload, (args.workload,))
    if oracle and args.workload != "oracle":
        print("NOTE: oracle zeroes block outputs for ALL workloads in this "
              "process; loop/random acceptance is only meaningful without "
              "--workload all (timing is unaffected either way)")
    for workload in workloads:
        prompts = prompts_for(workload)

        # compile + token-agreement check. Greedy spec decode is token-
        # identical in exact arithmetic; in bf16 the verify forward (width
        # k+1) and the decode forward (width 1) round differently (~0.06
        # logit delta measured, tools/diag_spec_numerics.py), so on RANDOM
        # weights — where greedy top-2 margins are ~1e-4 — ties flip. A
        # divergence is accepted as a tie-flip iff at the first differing
        # position the two paths' own chosen-token logprobs agree within
        # `tie_tol` (both are maxima of near-identical distributions;
        # the measured width-1 vs width-8 logit noise floor is ~0.075 —
        # tools/diag_spec_numerics.py — and a logic bug shows nats, not
        # hundredths);
        # anything larger is a real bug and still fails the run.
        tie_tol = 0.1
        plain = engine.generate(prompts, gen_cfg=gen)
        fast = engine.generate(prompts, gen_cfg=gen, spec=spec)
        n_same = n_tot = 0
        for i, (w, g) in enumerate(zip(plain.tokens, fast.tokens)):
            n = min(len(w), len(g))
            agree = int(np.argmin(np.r_[w[:n] == g[:n], False]))
            n_same += agree
            n_tot += n
            if agree < n:
                dlp = abs(plain.logprobs[i][agree] - fast.logprobs[i][agree])
                assert dlp < tie_tol, (
                    f"row {i}: diverged at pos {agree} with logprob gap "
                    f"{dlp:.4f} > {tie_tol} — not a bf16 tie-flip"
                )
                print(f"  row {i}: tie-flip at pos {agree} "
                      f"(logprob gap {dlp:.5f}); prefix identical")

        rows = {}
        for name, kw in (("plain", {}), ("spec", {"spec": spec})):
            t0 = time.perf_counter()
            res = engine.generate(prompts, gen_cfg=gen, **kw)
            dt = time.perf_counter() - t0
            n_tok = sum(len(t) for t in res.tokens)
            rows[name] = (n_tok / dt, dt, res.spec_rounds)
        print(f"  prefix agreement {n_same}/{n_tot} "
              f"({100.0 * n_same / max(n_tot, 1):.1f}%)")
        tps_p, dt_p, _ = rows["plain"]
        tps_s, dt_s, rounds = rows["spec"]
        # emitted-per-round uses the PRE-TRIM count (args.new per active
        # row), the quantity the loop actually controls
        per_round = args.batch * args.new / max(rounds, 1)
        print(
            f"[{workload:6s}] b{args.batch} {label}"
            f" +{args.new}tok: plain {tps_p:7.1f} tok/s ({dt_p*1e3:6.0f} ms)"
            f" | spec {tps_s:7.1f} tok/s ({dt_s*1e3:6.0f} ms)"
            f" | speedup {tps_s/tps_p:4.2f}x"
            f" | {rounds} rounds, {per_round:.2f} tok/round",
            flush=True,
        )


if __name__ == "__main__":
    main()
