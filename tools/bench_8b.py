"""Flagship benchmark: the REAL 8B Leopard-LLaVA profile on one v5e chip.

Round-1 VERDICT Weak #4 asked for flagship-scale numbers next to the 1.5B
stand-in's: with weight-only int8 (ops/quant.py) the 8B decoder (~7 GB int8)
plus the SigLIP tower fits a single 16 GB v5e, so prefill/TTFT/decode are
measurable without TP. Weights are random (throughput only): they are built
host-side with numpy against jax.eval_shape of the real init (no 16 GB bf16
materialization on device), quantized per output channel exactly like
quantize_tree, and device_put once.

Measures (16 tiles + 4096-token prompt, the BASELINE.md profile):
  - encoder images/s (SigLIP-SO400M-14-364, flash attention)
  - prefill tokens/s + TTFT
  - decode tokens/s at batch 1 and batch 8 (int8 KV cache)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUANT_TEXT_KEYS = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "lm_head"}


def _np_quantize_int4(arr, group=128):
    """numpy mirror of ops/quant.py::quantize_int4 (split-half nibble pack,
    per-(group, out-channel) scales) — lets the 8B int4 profile build on the
    host without materializing bf16 weights on device."""
    *lead, k, n = arr.shape
    assert k % (2 * group) == 0, (k, group)
    wf = arr.reshape(*lead, k // group, group, n)
    s = np.maximum(np.abs(wf).max(axis=-2, keepdims=True) / 7.0, 1e-8)
    q = (np.clip(np.round(wf / s), -7, 7) + 8.0).astype(np.uint8)
    q = q.reshape(*lead, k, n)
    lo, hi = q[..., : k // 2, :], q[..., k // 2 :, :]
    return {"q4": lo | (hi << 4),
            "s": s.reshape(*lead, k // group, n).astype(np.float32)}


def build_host_params(cfg, quantize_text="int8", seed=0):
    """numpy param tree with the exact structure/dtypes of vlm.init_params,
    with the decoder's matmul weights already quantized (dict{q,s} for int8,
    dict{q4,s} for int4 — same layouts as ops/quant.py)."""
    import jax
    import ml_dtypes

    from leopard_tpu.models import vlm

    shapes = jax.eval_shape(lambda k: vlm.init_params(cfg, k), jax.random.PRNGKey(0))
    # weight VALUES are irrelevant for throughput (dense-matmul timing is
    # data-independent); tile one random megablock instead of drawing 8B
    # samples on the single host core (~18 min → seconds)
    block = np.random.default_rng(seed).standard_normal(1 << 20).astype(np.float32)

    def fill(shape, scale):
        n = int(np.prod(shape)) if shape else 1
        reps = -(-n // block.size)
        return (np.tile(block, reps)[:n] * scale).reshape(shape)

    def leaf(path, sd):
        keys = [p.key for p in path if hasattr(p, "key")]
        fan_in = sd.shape[-2] if len(sd.shape) >= 2 else sd.shape[-1]
        if "norm" in " ".join(keys) or keys[-1].startswith("ln"):
            arr = np.ones(sd.shape, np.float32)
        else:
            arr = fill(sd.shape, fan_in**-0.5)
        if quantize_text and keys[0] == "text" and keys[-1] in QUANT_TEXT_KEYS:
            if quantize_text == "int4":
                return _np_quantize_int4(arr)
            scale = np.maximum(np.abs(arr).max(axis=-2, keepdims=True) / 127.0, 1e-8)
            q = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
            return {"q": q, "s": scale.astype(np.float32)}
        return arr.astype(ml_dtypes.bfloat16 if sd.dtype == np.dtype("bfloat16") else sd.dtype)

    return jax.tree_util.tree_map_with_path(leaf, shapes)


def main(n_tiles=16, seq=4096, new_tokens=128, decode_batches=(1, 8),
         decode_only=False, quantize="int8"):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from leopard_tpu import config as cfgs
    from leopard_tpu.inference.engine import _decode, _prefill
    from leopard_tpu.config import GenerateConfig
    from leopard_tpu.models import siglip as siglip_mod
    from leopard_tpu.models import vlm
    from leopard_tpu.models.decoder import KVCache

    cfg = cfgs.leopard_llava_8b()
    print(f"building 8B host params (numpy, {quantize} decoder)...", flush=True)
    t0 = time.perf_counter()
    cache_file = f"/tmp/leopard8b_host_params_{quantize}.pkl"
    if quantize == "int8" and not os.path.exists(cache_file):
        legacy = "/tmp/leopard8b_host_params.pkl"  # pre-r4 cache name
        if os.path.exists(legacy):
            cache_file = legacy
    if os.path.exists(cache_file):
        import pickle

        with open(cache_file, "rb") as f:
            host = pickle.load(f)
        print("  (loaded from cache)", flush=True)
    else:
        host = build_host_params(cfg, quantize_text=quantize)
        import pickle

        with open(cache_file, "wb") as f:
            pickle.dump(host, f, protocol=4)
    nbytes = sum(a.nbytes for a in jax.tree_util.tree_leaves(host))
    print(f"  built in {time.perf_counter()-t0:.0f}s, {nbytes/2**30:.2f} GiB", flush=True)
    t0 = time.perf_counter()
    params = jax.device_put(host)
    jax.block_until_ready(params)
    print(f"  device_put in {time.perf_counter()-t0:.0f}s", flush=True)
    del host

    tokens_per_tile = cfg.anyres.tokens_per_tile
    ids = np.full((1, seq), 11, np.int32)
    ids[0, 0] = 128000
    ids[0, 8 : 8 + n_tiles * tokens_per_tile] = cfg.image_token_id
    tokens = jnp.asarray(ids)
    seg = jnp.ones((1, seq), jnp.int32)
    images = jnp.asarray(
        np.random.RandomState(0).randn(n_tiles, 3, 364, 364), jnp.bfloat16
    )

    if decode_only:
        _decode_section(params, cfg, tokens, seq, new_tokens, decode_batches,
                        quantize)
        return

    # ---- encoder ----
    @jax.jit
    def encode(params, images):
        return siglip_mod.forward(params["vision"], cfg.vision, images).sum()

    np.asarray(encode(params, images))
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out = encode(params, images)
    np.asarray(out)
    enc_dt = (time.perf_counter() - t0) / iters
    print(f"encoder: {n_tiles/enc_dt:.1f} images/s ({enc_dt*1e3:.1f} ms / {n_tiles} tiles)", flush=True)

    # ---- prefill (encode + splice + decoder, logits at last position) ----
    @jax.jit
    def feats_fn(params, images):
        return vlm.encode_images(params, cfg, images)

    cache_len = 4096 + 256
    feats = feats_fn(params, images)
    cache = KVCache.create(cfg.text, 1, cache_len, quantized=True)
    np.asarray(_prefill(params, cfg, tokens, seg, cache, feats, fresh=True)[0])

    # fresh=True is the engine's own path: flash-tier attention while the
    # cache fills. The cache argument is donated, so each iteration creates a
    # fresh one (zeros init ≈ 0.3 ms — noise next to the prefill itself)
    t0 = time.perf_counter()
    for _ in range(iters):
        feats = feats_fn(params, images)
        cache = KVCache.create(cfg.text, 1, cache_len, quantized=True)
        logits, cache2 = _prefill(params, cfg, tokens, seg, cache, feats,
                                  fresh=True)
    np.asarray(logits)
    dt = (time.perf_counter() - t0) / iters
    print(f"prefill: {seq/dt:.1f} tok/s, TTFT {dt*1e3:.1f} ms ({n_tiles} tiles + {seq} tok)", flush=True)

    _decode_section(params, cfg, tokens, seq, new_tokens, decode_batches,
                    quantize)


def _decode_section(params, cfg, tokens, seq, new_tokens, decode_batches,
                    quantize="int8"):
    import jax
    import jax.numpy as jnp

    from leopard_tpu.config import GenerateConfig
    from leopard_tpu.inference.engine import _decode, _prefill
    from leopard_tpu.models.decoder import KVCache

    cache_len = seq + 256
    gen = GenerateConfig(max_new_tokens=new_tokens, greedy=True, eos_token_ids=(999999,))
    for b in decode_batches:
        def fill_context(b):
            # single-shot fresh prefill (flash tier — no dense-score blowup
            # at batch 8, so no chunking needed)
            cache_b = KVCache.create(cfg.text, b, cache_len, quantized=True)
            toks_b = jnp.broadcast_to(tokens, (b, seq))
            seg_b = jnp.ones((b, seq), jnp.int32)
            logits_b, cache_b = _prefill(params, cfg, toks_b, seg_b, cache_b,
                                         None, fresh=True)
            # SYNC before the caller starts a timer: dispatch is async, and
            # an un-synced fill chain silently inflates the decode timing
            # (this exact bug once read 76 ms/step for an 18 ms/step decode)
            np.asarray(logits_b)
            return logits_b, cache_b

        toks_b = jnp.broadcast_to(tokens, (b, seq))
        seg_b = jnp.ones((b, seq), jnp.int32)
        logits_b, cache_b = fill_context(b)
        np.asarray(_decode(params, cfg, gen, logits_b, toks_b, seg_b, cache_b,
                           jax.random.PRNGKey(0), new_tokens)[0])
        logits_b, cache_b = fill_context(b)  # decode donated the cache
        t0 = time.perf_counter()
        out = _decode(params, cfg, gen, logits_b, toks_b, seg_b, cache_b,
                      jax.random.PRNGKey(0), new_tokens)[0]
        np.asarray(out)
        dt = time.perf_counter() - t0
        print(
            f"decode ({quantize} weights + int8 KV, batch {b}): "
            f"{b*new_tokens/dt:.1f} tok/s total ({dt*1e3/new_tokens:.2f} ms/step)",
            flush=True,
        )


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--decode-only", action="store_true",
                   help="skip encoder/prefill timing (crossover retunes)")
    p.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    p.add_argument("--quantize", default="int8", choices=("int8", "int4"))
    a = p.parse_args()
    main(decode_batches=tuple(a.batches), decode_only=a.decode_only,
         quantize=a.quantize)
