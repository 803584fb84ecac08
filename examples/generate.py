"""Generate from a Leopard checkpoint (multi-image prompt → text).

Entry-point parity with examples/llava/gen_llava.py (Megatron-native
generation CLI):

  python examples/generate.py --checkpoint /ckpts/leopard-llava-hf \
      --tokenizer /ckpts/leopard-llava-hf \
      --question "<image> What does the slide say?" \
      --images slide1.png slide2.png --beam 0
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help="HF checkpoint dir")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--question", required=True)
    p.add_argument("--images", nargs="*", default=[])
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=0.0)
    p.add_argument("--beam", type=int, default=0, help=">0 enables beam search")
    p.add_argument("--greedy", action="store_true", default=None)
    args = p.parse_args()

    from PIL import Image

    from leopard_tpu import config as cfgs
    from leopard_tpu.config import GenerateConfig
    from leopard_tpu.convert.hf import convert_leopard_llava, load_hf_state_dict
    from leopard_tpu.data.processor import LeopardProcessor
    from leopard_tpu.data.tokenizer import build_tokenizer
    from leopard_tpu.inference.engine import Engine

    cfg = cfgs.leopard_llava_8b()
    tokenizer = build_tokenizer(args.tokenizer or args.checkpoint)
    params = convert_leopard_llava(load_hf_state_dict(args.checkpoint), cfg)

    greedy = args.greedy if args.greedy is not None else (
        args.top_k == 0 and args.top_p == 0.0 and args.temperature == 1.0
    )
    gen_cfg = GenerateConfig(
        max_new_tokens=args.max_new_tokens, temperature=args.temperature,
        top_k=args.top_k, top_p=args.top_p, greedy=greedy,
        eos_token_ids=(128001, 128009),
    )
    engine = Engine(cfg, params, gen_cfg)
    processor = LeopardProcessor(cfg, tokenizer, layout="eval")

    images = [Image.open(f).convert("RGB") for f in args.images]
    prompt, pixels = processor.process_eval(args.question, images)

    if args.beam > 0:
        from leopard_tpu.inference.beam import beam_search

        tokens = beam_search(engine, prompt, images=pixels if len(images) else None,
                             beam_width=args.beam,
                             max_new_tokens=args.max_new_tokens)
    else:
        result = engine.generate([prompt], images=pixels if len(images) else None,
                                 gen_cfg=gen_cfg)
        tokens = result.tokens[0]
    print(tokenizer.decode(tokens.tolist(), skip_special_tokens=True))


if __name__ == "__main__":
    main()
