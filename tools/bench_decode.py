"""Decode throughput benchmark: tokens/sec for KV-cache autoregressive decode
(the eval harness cost driver: 128 new tokens per sample)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(prompt_len=512, new_tokens=128, batch=1, quantize=None,
         kv_store="auto"):
    os.environ["LEOPARD_KV_STORE"] = kv_store
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from __graft_entry__ import _flagship_single_chip_cfg
    from leopard_tpu.config import GenerateConfig
    from leopard_tpu.inference.engine import Engine
    from leopard_tpu.models import vlm

    cfg = _flagship_single_chip_cfg()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    engine = Engine(cfg, params, quantize=quantize,
                    quantize_kv=quantize is not None)
    gen = GenerateConfig(max_new_tokens=new_tokens, greedy=True,
                         eos_token_ids=(999999,))
    prompts = [np.random.RandomState(i).randint(1, 1000, prompt_len).astype(np.int32)
               for i in range(batch)]
    engine.generate(prompts, gen_cfg=gen)  # compile
    t0 = time.perf_counter()
    engine.generate(prompts, gen_cfg=gen)
    dt = time.perf_counter() - t0
    total = new_tokens * batch
    print(f"decode ({quantize or 'bf16'}): {total / dt:.1f} tokens/s "
          f"(batch {batch}, {new_tokens} steps, "
          f"{dt * 1e3 / new_tokens:.2f} ms/step)")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--prompt-len", type=int, default=512)
    p.add_argument("--new-tokens", type=int, default=128)
    p.add_argument("--quantize", default=None, choices=("int8", "int4"),
                   help="weight-only quantization + int8 KV cache")
    p.add_argument("--kv-store", choices=("auto", "scatter", "dus"),
                   default="auto",
                   help="force the cache-write formulation (crossover tuning)")
    a = p.parse_args()
    main(a.prompt_len, a.new_tokens, a.batch, a.quantize, a.kv_store)
