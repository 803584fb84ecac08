"""Measure the HF-PyTorch-CPU multi-image prefill throughput baseline.

Runs the exact model profile bench.py uses (full SigLIP-SO400M-14-364 vision
tower + llama3.1-style GQA decoder, hidden 2048 / 16 layers) through HF
transformers on CPU, on a reduced workload (tiles/seq scaled down), and
extrapolates linearly by FLOPs to the bench workload (16 tiles, 4096 tokens).
Linear extrapolation is conservative in our favor's *opposite* direction:
attention cost grows quadratically with sequence, so the true CPU throughput
at 4096 is lower than reported here.

The resulting tokens/s constant is recorded as BASELINE_CPU_TOK_S in bench.py.
"""

import time

import numpy as np
import torch


def main(n_tiles=2, seq=512, full_tiles=16, full_seq=4096):
    from transformers import (
        LlamaConfig,
        LlamaForCausalLM,
        SiglipVisionConfig,
        SiglipVisionModel,
    )

    torch.set_num_threads(torch.get_num_threads())
    vision_cfg = SiglipVisionConfig(
        hidden_size=1152, intermediate_size=4304, num_hidden_layers=27,
        num_attention_heads=16, image_size=364, patch_size=14,
        attn_implementation="sdpa",
    )
    text_cfg = LlamaConfig(
        vocab_size=128256, hidden_size=2048, intermediate_size=8192,
        num_hidden_layers=16, num_attention_heads=16, num_key_value_heads=8,
        head_dim=128, attn_implementation="sdpa",
    )
    with torch.device("cpu"):
        vision = SiglipVisionModel(vision_cfg).eval()
        text = LlamaForCausalLM(text_cfg).eval()

    pixels = torch.randn(n_tiles, 3, 364, 364)
    ids = torch.randint(0, 1000, (1, seq))

    with torch.no_grad():
        # warmup
        vision(pixels[:1])
        text(ids[:, :64])
        t0 = time.perf_counter()
        vision(pixels)
        t_vision = time.perf_counter() - t0
        t0 = time.perf_counter()
        text(ids)
        t_text = time.perf_counter() - t0

    # linear-FLOP extrapolation to the bench workload
    t_full = t_vision * (full_tiles / n_tiles) + t_text * (full_seq / seq)
    tok_s = full_seq / t_full
    print(f"measured: vision({n_tiles} tiles)={t_vision:.2f}s text({seq} tok)={t_text:.2f}s")
    print(f"extrapolated full workload ({full_tiles} tiles, {full_seq} tok): {t_full:.2f}s")
    print(f"BASELINE_CPU_TOK_S = {tok_s:.2f}")


if __name__ == "__main__":
    main()
