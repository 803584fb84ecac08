"""Evaluation-driver throughput on TPU: serial vs batched harness.

Round-1 VERDICT Weak #6 / next-round #8: the reference (and our round-1
harness) drives inference one row at a time; batch-8 decode measured ~7×
single-row throughput, so eval wall-clock was dominated by the driver. This
measures samples/s of run_benchmark (serial) vs run_benchmark_batched on a
synthetic DocVQA-style set with the single-chip flagship profile — target
≥4× (the bar set in the verdict).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class CharTokenizer:
    """Character-level stand-in (id space < vocab); enough for throughput —
    the engine does identical work regardless of token values."""

    bos_token_id = 128000
    SPECIALS = {
        "<|start_header_id|>": 128006,
        "<|end_header_id|>": 128007,
        "<|eot_id|>": 128009,
    }

    def __call__(self, text, add_special_tokens=False):
        ids = []
        i = 0
        while i < len(text):
            for s, tid in self.SPECIALS.items():
                if text.startswith(s, i):
                    ids.append(tid)
                    i += len(s)
                    break
            else:
                ids.append(ord(text[i]) % 1000 + 10)
                i += 1
        return {"input_ids": ids}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


def make_rows(tmpdir, n=24, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        n_img = 1 + (i % 3 == 0)  # mix of 1- and 2-image rows
        paths = []
        for j in range(n_img):
            p = os.path.join(tmpdir, f"r{i}_{j}.png")
            w, h = int(rng.randint(300, 900)), int(rng.randint(300, 900))
            Image.fromarray(
                (rng.rand(h, w, 3) * 255).astype(np.uint8)
            ).save(p)
            paths.append(p)
        rows.append({
            "images_path": paths,
            "question": "<image>" * n_img + f" what does line {i} of the document say?",
            "options": None,
            "answers": ["synthetic"],
            "ques_type": "open-ended",
        })
    return rows


def main(n_rows=24, batch_size=8, max_new_tokens=32, profile="1.5b"):
    import tempfile

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from __graft_entry__ import _flagship_single_chip_cfg
    from leopard_tpu.config import GenerateConfig
    from leopard_tpu.evaluation.adapter import LeopardLlavaEvalAdapter
    from leopard_tpu.evaluation.harness import run_benchmark, run_benchmark_batched
    from leopard_tpu.models import vlm

    quantize_kv = False
    if profile == "8b":
        # the REAL flagship: int8 host params from bench_8b's pickle cache
        # (build them once via tools/bench_8b.py), int8 KV cache
        import pickle

        from leopard_tpu import config as cfgs

        cfg = cfgs.leopard_llava_8b()
        with open("/tmp/leopard8b_host_params.pkl", "rb") as f:
            params = pickle.load(f)
        params = jax.device_put(params)
        jax.block_until_ready(params)
        quantize_kv = True
    else:
        cfg = _flagship_single_chip_cfg()
        params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    gen = GenerateConfig(max_new_tokens=max_new_tokens, greedy=True,
                         eos_token_ids=(999999,))
    adapter = LeopardLlavaEvalAdapter(cfg, params, CharTokenizer(), gen_cfg=gen)
    adapter.engine.quantize_kv = quantize_kv

    with tempfile.TemporaryDirectory() as td:
        rows = make_rows(td, n=n_rows)
        # warm EVERY (tile, seq, batch) bucket program both paths will hit —
        # a partial warmup leaves relay compiles inside the timed region
        run_benchmark(rows, adapter, "docvqa", "direct")
        run_benchmark_batched(rows, adapter, "docvqa", "direct",
                              batch_size=batch_size)

        t0 = time.perf_counter()
        serial = run_benchmark(rows, adapter, "docvqa", "direct")
        dt_serial = time.perf_counter() - t0

        t0 = time.perf_counter()
        batched = run_benchmark_batched(
            rows, adapter, "docvqa", "direct", batch_size=batch_size
        )
        dt_batched = time.perf_counter() - t0

    # bit-identical responses across padding shapes is only guaranteed in
    # f32 (asserted by the CPU e2e tests); with RANDOM weights in bf16 the
    # logits are near-ties everywhere, so shape-dependent rounding can flip
    # greedy argmax — report agreement instead of asserting it
    same = sum(a["raw"] == b["raw"] for a, b in zip(serial, batched))
    print(
        f"serial:  {n_rows/dt_serial:.2f} samples/s ({dt_serial:.1f}s / {n_rows})\n"
        f"batched: {n_rows/dt_batched:.2f} samples/s ({dt_batched:.1f}s, batch {batch_size})\n"
        f"speedup: {dt_serial/dt_batched:.2f}x "
        f"({same}/{n_rows} responses identical; bf16 argmax near-ties)"
    )


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=24)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-new-tokens", type=int, default=32)
    p.add_argument("--profile", choices=("1.5b", "8b"), default="1.5b")
    a = p.parse_args()
    main(a.rows, a.batch_size, a.max_new_tokens, a.profile)
