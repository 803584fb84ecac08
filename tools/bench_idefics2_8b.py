"""Flagship benchmark #2: the REAL 8B Leopard-Idefics2 profile on one v5e.

Same method as tools/bench_8b.py (host-built random int8 params — matmul
timing is data-independent) for the second model family: Idefics2 NaViT
vision tower (980×980, patch masks) + perceiver resampler (64 latents/image)
+ Mistral-7B decoder with sliding window 4096, at the reference's serving
shape — seq 8192 with 8 images (train_multiimg_idefics2.sh:52-78,
idefics2_multiimg.py:62 caps eval at 8 images).

Measures:
  - encoder+perceiver images/s
  - prefill tokens/s + TTFT (8 images × 64 tokens + 8192-token prompt)
  - decode tokens/s at batch 1 and batch 4 (int8 KV; sliding-window mask)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_images=8, seq=8192, new_tokens=128, decode_batches=(1, 4)):
    import pickle

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from bench_8b import build_host_params
    from leopard_tpu import config as cfgs
    from leopard_tpu.config import GenerateConfig
    from leopard_tpu.inference.engine import _decode, _prefill
    from leopard_tpu.models import vlm
    from leopard_tpu.models.decoder import KVCache

    cfg = cfgs.leopard_idefics2_8b()
    print("building Idefics2-8B host params (numpy, int8 decoder)...", flush=True)
    t0 = time.perf_counter()
    cache_file = "/tmp/leopard_idefics2_8b_host_params.pkl"
    if os.path.exists(cache_file):
        with open(cache_file, "rb") as f:
            host = pickle.load(f)
        print("  (loaded from cache)", flush=True)
    else:
        host = build_host_params(cfg)
        with open(cache_file, "wb") as f:
            pickle.dump(host, f, protocol=4)
    nbytes = sum(a.nbytes for a in jax.tree_util.tree_leaves(host))
    print(f"  built in {time.perf_counter()-t0:.0f}s, {nbytes/2**30:.2f} GiB", flush=True)
    t0 = time.perf_counter()
    params = jax.device_put(host)
    jax.block_until_ready(params)
    print(f"  device_put in {time.perf_counter()-t0:.0f}s", flush=True)
    del host

    tokens_per_image = cfg.anyres.tokens_per_tile  # 64 perceiver latents
    ids = np.full((1, seq), 11, np.int32)
    ids[0, 0] = 1
    ids[0, 8 : 8 + n_images * tokens_per_image] = cfg.image_token_id
    tokens = jnp.asarray(ids)
    seg = jnp.ones((1, seq), jnp.int32)
    images = jnp.asarray(
        np.random.RandomState(0).randn(n_images, 3, 980, 980), jnp.bfloat16
    )
    npatch = 980 // cfg.vision.patch_size
    patch_mask = jnp.ones((n_images, npatch, npatch), jnp.bool_)

    # ---- encoder + perceiver ----
    @jax.jit
    def feats_fn(params, images, patch_mask):
        return vlm.encode_images(params, cfg, images, patch_mask)

    feats = feats_fn(params, images, patch_mask)
    np.asarray(feats)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out = feats_fn(params, images, patch_mask)
    np.asarray(out)
    enc_dt = (time.perf_counter() - t0) / iters
    print(f"encoder+perceiver: {n_images/enc_dt:.1f} images/s "
          f"({enc_dt*1e3:.1f} ms / {n_images} images)", flush=True)

    # ---- prefill (sliding window 4096 in the flash tier) ----
    cache_len = seq + 256
    cache = KVCache.create(cfg.text, 1, cache_len, quantized=True)
    np.asarray(_prefill(params, cfg, tokens, seg, cache, feats, fresh=True)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        feats = feats_fn(params, images, patch_mask)
        cache = KVCache.create(cfg.text, 1, cache_len, quantized=True)
        logits, _ = _prefill(params, cfg, tokens, seg, cache, feats, fresh=True)
    np.asarray(logits)
    dt = (time.perf_counter() - t0) / iters
    print(f"prefill: {seq/dt:.1f} tok/s, TTFT {dt*1e3:.1f} ms "
          f"({n_images} images + {seq} tok, window {cfg.text.sliding_window})",
          flush=True)

    # ---- decode ----
    gen = GenerateConfig(max_new_tokens=new_tokens, greedy=True,
                         eos_token_ids=(999999,))
    for b in decode_batches:
        cache_b = KVCache.create(cfg.text, b, cache_len, quantized=True)
        toks_b = jnp.broadcast_to(tokens, (b, seq))
        seg_b = jnp.ones((b, seq), jnp.int32)
        logits_b, cache_b = _prefill(params, cfg, toks_b, seg_b, cache_b,
                                     None, fresh=True)
        np.asarray(logits_b)  # SYNC before any timing (async dispatch!)
        np.asarray(_decode(params, cfg, gen, logits_b, toks_b, seg_b, cache_b,
                           jax.random.PRNGKey(0), new_tokens)[0])
        cache_b = KVCache.create(cfg.text, b, cache_len, quantized=True)
        logits_b, cache_b = _prefill(params, cfg, toks_b, seg_b, cache_b,
                                     None, fresh=True)
        np.asarray(logits_b)
        t0 = time.perf_counter()
        out = _decode(params, cfg, gen, logits_b, toks_b, seg_b, cache_b,
                      jax.random.PRNGKey(0), new_tokens)[0]
        np.asarray(out)
        dt = time.perf_counter() - t0
        print(
            f"decode (int8 weights + int8 KV, batch {b}): "
            f"{b*new_tokens/dt:.1f} tok/s total ({dt*1e3/new_tokens:.2f} ms/step)",
            flush=True,
        )


if __name__ == "__main__":
    main()
