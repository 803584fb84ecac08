"""Serve a Leopard checkpoint over HTTP.

  # plain engine (sampling, logprobs, optional speculative decoding)
  python examples/serve.py --checkpoint /ckpts/leopard-llava-hf \
      --tokenizer /ckpts/leopard-llava-hf --port 5000 --quantize int8 --spec 7

  # continuous batching (slot refill, per-request token budgets)
  python examples/serve.py --checkpoint /ckpts/leopard-llava-hf \
      --continuous --slots 8 --cache-len 2048 --quantize int8
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--quantize", default=None, choices=[None, "int8", "int4"])
    p.add_argument("--arch", default="leopard_llava",
                   choices=["leopard_llava", "leopard_idefics2"])
    p.add_argument("--spec", type=int, default=0, metavar="DRAFT",
                   help="prompt-lookup speculative decoding draft length for "
                        "greedy requests (0 = off); token-identical output")
    p.add_argument("--spec-ngram", type=int, default=2)
    p.add_argument("--continuous", action="store_true",
                   help="serve through the continuous-batching slot pool")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--cache-len", type=int, default=2048)
    p.add_argument("--max-new-cap", type=int, default=512)
    p.add_argument("--system-prompt", default=None,
                   help="shared system prompt, prefilled ONCE and KV-cached "
                        "(prefix caching) — prepended to every request")
    args = p.parse_args()
    if args.spec and args.system_prompt:
        p.error("--spec and --system-prompt (prefix caching) are mutually "
                "exclusive")
    if args.spec and args.continuous:
        p.error("--spec applies only to the plain engine path; the "
                "continuous slot pool decodes one token per row per step. "
                "Drop one of --spec / --continuous.")

    from leopard_tpu import config as cfgs
    from leopard_tpu.convert.hf import (
        convert_leopard_idefics2,
        convert_leopard_llava,
        load_hf_state_dict,
    )
    from leopard_tpu.data.tokenizer import build_tokenizer
    from leopard_tpu.inference.engine import Engine
    from leopard_tpu.inference.server import GenerationServer

    tokenizer = build_tokenizer(args.tokenizer or args.checkpoint)
    sd = load_hf_state_dict(args.checkpoint)
    if args.arch == "leopard_llava":
        cfg = cfgs.leopard_llava_8b()
        params = convert_leopard_llava(sd, cfg)
    else:
        cfg = cfgs.leopard_idefics2_8b()
        params = convert_leopard_idefics2(sd, cfg)
    engine = Engine(cfg, params, quantize=args.quantize,
                    quantize_kv=args.quantize is not None)
    continuous = None
    if args.continuous:
        from leopard_tpu.inference.continuous import ContinuousEngine

        continuous = ContinuousEngine(
            engine, slots=args.slots, cache_len=args.cache_len,
            max_new_cap=args.max_new_cap,
        )
    spec = None
    if args.spec:
        from leopard_tpu.inference.speculative import SpecConfig

        spec = SpecConfig(ngram=args.spec_ngram, draft=args.spec)
    prefix = None
    if args.system_prompt:
        import numpy as np

        ids = tokenizer(args.system_prompt,
                        add_special_tokens=True)["input_ids"]
        prefix = engine.build_prefix(np.asarray(ids, np.int32))
        print(f"system prompt cached: {prefix.length} tokens")
    GenerationServer(engine, tokenizer, args.host, args.port,
                     continuous=continuous, spec=spec,
                     prefix=prefix).serve_forever()


if __name__ == "__main__":
    main()
