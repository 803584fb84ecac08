"""Decode roofline table (VERDICT r2 next #7): for a profile × dtype × batch
grid, measure decode-only ms/step (prefill excluded, host-synced timers) and
compare against the HBM-bandwidth roofline computed from the bytes each step
must move (weights + KV cache + scales). Prints a markdown table for STATUS.

Usage:  python tools/roofline_decode.py [--profile 1.5b|8b] [--steps 128]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_GBPS = 819.0  # v5e HBM bandwidth (public spec: 819 GB/s)


def decoder_weight_bytes(t, quantized: bool) -> int:
    """Bytes of decoder weights read per decode step (every layer's matmuls
    + final norm + lm_head; the embedding gather reads one row)."""
    h, f, L = t.hidden_size, t.intermediate_size, t.num_layers
    qd, kvd = t.num_heads * t.head_dim, t.num_kv_heads * t.head_dim
    per_layer_params = h * qd + 2 * h * kvd + qd * h + 3 * h * f
    n = L * per_layer_params + h * t.vocab_size  # + lm_head
    if quantized:
        # int8 data + f32 per-output-channel scales
        per_layer_scales = qd + 2 * kvd + h + 2 * f + h
        return n + 4 * (L * per_layer_scales + t.vocab_size)
    return 2 * n  # bf16


def kv_bytes_per_step(t, batch: int, mean_len: int, quantized: bool) -> int:
    """KV cache bytes read (+written) per decode step at mean context len."""
    h2 = 2 * t.num_kv_heads
    width = 1 if quantized else 2
    read = batch * mean_len * h2 * t.head_dim * width
    if quantized:
        read += batch * mean_len * h2 * 4  # f32 scales (separate buffer)
    write = batch * h2 * t.head_dim * width + (batch * h2 * 4 if quantized else 0)
    return read + write


def measure(cfg, quantize: bool, batch: int, prompt_len: int, steps: int):
    import jax
    import jax.numpy as jnp

    from leopard_tpu.config import GenerateConfig
    from leopard_tpu.inference.engine import Engine, _decode, _prefill
    from leopard_tpu.models.decoder import KVCache

    engine = Engine(cfg, measure._raw_params,
                    quantize=None if measure._prequantized
                    else ("int8" if quantize else None),
                    quantize_kv=quantize)
    gen = GenerateConfig(max_new_tokens=steps, greedy=True,
                         eos_token_ids=(999999,))
    rng = np.random.RandomState(0)
    tokens = rng.randint(1, 1000, (batch, prompt_len)).astype(np.int32)
    seg = np.ones_like(tokens)
    cache_len = engine._bucket(prompt_len + steps, engine.seq_buckets)

    def run():
        cache = KVCache.create(cfg.text, batch, cache_len,
                               quantized=quantize)
        first, cache = _prefill(engine.params, cfg, jnp.asarray(tokens),
                                jnp.asarray(seg), cache, None, fresh=True)
        np.asarray(first)  # sync: keep prefill out of the decode timer
        t0 = time.perf_counter()
        bufs = _decode(engine.params, cfg, gen, first, jnp.asarray(tokens),
                       jnp.asarray(seg), cache, jax.random.PRNGKey(0), steps)
        np.asarray(bufs[0])  # sync
        return time.perf_counter() - t0

    run()  # compile
    dt = min(run() for _ in range(2))
    return dt / steps  # s/step


measure._raw_params = None
measure._prequantized = False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="1.5b", choices=("1.5b", "8b"))
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--modes", nargs="+", default=["bf16", "int8"],
                    choices=("bf16", "int8"),
                    help="8B bf16 (~15 GB weights + fp32 master in the "
                         "Engine build) exceeds one 16 GB v5e — use "
                         "--modes int8 there")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from __graft_entry__ import _flagship_single_chip_cfg
    from leopard_tpu import config as cfgs
    from leopard_tpu.models import vlm

    if args.profile == "1.5b":
        cfg = _flagship_single_chip_cfg()
        measure._raw_params = vlm.init_params(cfg, jax.random.PRNGKey(0))
        measure._prequantized = False
    else:
        # the real 8B never fits as a bf16 device init; reuse bench_8b's
        # already-int8 host params (build once via tools/bench_8b.py)
        import pickle

        cfg = cfgs.leopard_llava_8b()
        with open("/tmp/leopard8b_host_params.pkl", "rb") as f:
            host = pickle.load(f)
        measure._raw_params = jax.device_put(host)
        jax.block_until_ready(measure._raw_params)
        del host
        measure._prequantized = True
        if "bf16" in args.modes:
            print("(8B bf16 skipped: exceeds one 16 GB v5e)")
            args.modes = [m for m in args.modes if m != "bf16"]

    t = cfg.text
    mean_len = args.prompt_len + args.steps // 2
    print(f"profile={args.profile} prompt={args.prompt_len} steps={args.steps} "
          f"mean_ctx={mean_len}  (v5e roofline @ {V5E_HBM_GBPS} GB/s)\n")
    print("| mode | batch | weights MB | KV MB/step | roofline ms | "
          "measured ms | roofline % | tok/s |")
    print("|---|---|---|---|---|---|---|---|")
    for quant in (False, True):
        if ("int8" if quant else "bf16") not in args.modes:
            continue
        for batch in (1, 8):
            wb = decoder_weight_bytes(t, quant)
            kb = kv_bytes_per_step(t, batch, mean_len, quant)
            total = wb + kb
            roof_ms = total / (V5E_HBM_GBPS * 1e9) * 1e3
            s_step = measure(cfg, quant, batch, args.prompt_len, args.steps)
            ms = s_step * 1e3
            toks = batch / s_step
            mode = "int8" if quant else "bf16"
            print(f"| {mode} | {batch} | {wb/1e6:.0f} | {kb/1e6:.1f} | "
                  f"{roof_ms:.2f} | {ms:.2f} | {roof_ms/ms*100:.0f}% | "
                  f"{toks:.1f} |", flush=True)


if __name__ == "__main__":
    main()
