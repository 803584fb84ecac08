"""Run the evaluation suite on a Leopard checkpoint.

Entry-point parity with evaluations/models/run_eval_llava_siglip_multiimg.sh
+ llava_multiimg_siglip_anyres.py (shard → score → group_acc → merge):

  python examples/run_eval.py --checkpoint /ckpts/leopard-llava-hf \
      --datasets docvqa slidevqa --data-root /data/eval \
      --setting direct --result-dir results/
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--datasets", nargs="+", default=[
        "mpdocvqa", "dude", "slidevqa", "mirb", "mmmu", "mathvista",
        "scienceqa", "textvqa", "docvqa", "visualwebbench",
    ])
    p.add_argument("--data-root", required=True,
                   help="directory containing one subdir (or prepared "
                        "eval_<name>.jsonl) per benchmark")
    p.add_argument("--setting", default="direct", choices=["direct", "cot", "none"])
    p.add_argument("--result-dir", default="eval_results")
    p.add_argument("--shard", type=int, default=0)
    p.add_argument("--num-shards", type=int, default=1)
    p.add_argument("--max-samples", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=8,
                   help="rows per engine batch (1 = serial driver); batched "
                        "decode measured ~7x serial throughput on v5e")
    p.add_argument("--arch", default="leopard_llava",
                   choices=["leopard_llava", "leopard_idefics2"])
    p.add_argument("--quantize", default=None, choices=["int8", "int4"],
                   help="weight-only decoder quantization (also stores the "
                        "KV cache int8); halves (int8) / quarters (int4) the "
                        "HBM bytes each decode step reads")
    p.add_argument("--spec", type=int, default=0, metavar="DRAFT",
                   help="prompt-lookup speculative decoding with this draft "
                        "length (0 = off). Token-identical to plain greedy "
                        "(up to bf16 argmax ties — inference/speculative.py); "
                        "fastest on quote-heavy DocVQA-style answers")
    p.add_argument("--spec-ngram", type=int, default=2)
    p.add_argument("--prefix-caching", action="store_true",
                   help="prefill each batch's common prompt header (system "
                        "preamble + instruction) once and KV-seed it into "
                        "every row — token-identical, skips re-prefilling "
                        "the shared header; ignored with --spec")
    args = p.parse_args()

    from leopard_tpu import config as cfgs
    from leopard_tpu.convert.hf import (
        convert_leopard_idefics2,
        convert_leopard_llava,
        load_hf_state_dict,
    )
    from leopard_tpu.data.tokenizer import build_tokenizer
    from leopard_tpu.evaluation.adapter import (
        LeopardIdefics2EvalAdapter,
        LeopardLlavaEvalAdapter,
    )
    from leopard_tpu.evaluation.harness import (
        merge_all_bench_results,
        merge_shard_files,
        run_benchmark,
        run_benchmark_batched,
    )
    from leopard_tpu.evaluation.loaders import load_benchmark, write_jsonl

    tokenizer = build_tokenizer(args.tokenizer or args.checkpoint)
    spec = None
    if args.spec:
        from leopard_tpu.inference.speculative import SpecConfig

        spec = SpecConfig(ngram=args.spec_ngram, draft=args.spec)
    serve_kw = dict(
        quantize=args.quantize,
        quantize_kv=args.quantize is not None,
        spec=spec,
        prefix_caching=args.prefix_caching,
    )
    if args.arch == "leopard_llava":
        cfg = cfgs.leopard_llava_8b()
        params = convert_leopard_llava(load_hf_state_dict(args.checkpoint), cfg)
        adapter = LeopardLlavaEvalAdapter(cfg, params, tokenizer, **serve_kw)
    else:
        cfg = cfgs.leopard_idefics2_8b()
        params = convert_leopard_idefics2(load_hf_state_dict(args.checkpoint), cfg)
        adapter = LeopardIdefics2EvalAdapter(cfg, params, tokenizer, **serve_kw)

    os.makedirs(args.result_dir, exist_ok=True)
    for dataset in args.datasets:
        root = os.path.join(args.data_root, dataset)
        rows = load_benchmark(dataset, root)
        if args.max_samples:
            rows = rows[: args.max_samples]
        if args.batch_size > 1:
            details = run_benchmark_batched(
                rows, adapter, dataset, args.setting,
                shard=args.shard, num_shards=args.num_shards,
                batch_size=args.batch_size, progress=True,
            )
        else:
            details = run_benchmark(
                rows, adapter, dataset, args.setting,
                shard=args.shard, num_shards=args.num_shards, progress=True,
            )
        shard_file = os.path.join(
            args.result_dir,
            f"{args.shard}_{args.setting}_{dataset}_shard_details.jsonl",
        )
        write_jsonl(shard_file, details)
        if args.num_shards == 1 or args.shard == 0:
            report = merge_shard_files(args.result_dir, dataset, args.setting)
            print(dataset, report)

    if args.shard == 0:
        print(merge_all_bench_results(args.result_dir))


if __name__ == "__main__":
    main()
