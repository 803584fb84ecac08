"""Serve a Leopard checkpoint over HTTP.

  python examples/serve.py --checkpoint /ckpts/leopard-llava-hf \
      --tokenizer /ckpts/leopard-llava-hf --port 5000 --quantize int8
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--quantize", default=None, choices=[None, "int8"])
    p.add_argument("--arch", default="leopard_llava",
                   choices=["leopard_llava", "leopard_idefics2"])
    args = p.parse_args()

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
    engine = Engine(cfg, params, quantize=args.quantize)
    GenerationServer(engine, tokenizer, args.host, args.port).serve_forever()


if __name__ == "__main__":
    main()
