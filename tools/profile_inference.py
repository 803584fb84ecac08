"""Op-level TPU profiling for the inference engine (observability, SURVEY §5).

Captures a jax.profiler trace of prefill and/or decode at a chosen profile and
prints the per-op time table (fusions, while loops, Pallas kernels) — the
workflow that located the round-2 decode and prefill hotspots. Works through
the axon relay (device events come back in the trace).

Usage:
  python tools/profile_inference.py --phase decode --profile 1.5b
  python tools/profile_inference.py --phase prefill --profile 8b  # needs the
      bench_8b pickle at /tmp/leopard8b_host_params.pkl
"""

import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def op_table(trace_dir: str, top: int = 30):
    """Aggregate duration by op name from the newest trace in trace_dir."""
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    agg = {}
    for e in data.get("traceEvents", []):
        # host-side python frames are prefixed with '$' — skip them
        if e.get("ph") == "X" and not e.get("name", "").startswith("$"):
            agg[e["name"]] = agg.get(e["name"], 0) + e.get("dur", 0)
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    width = max((len(n) for n, _ in rows), default=10)
    for n, d in rows:
        print(f"{d/1e3:9.2f} ms  {n[:width]}")
    return agg


def _load_params(profile: str, cfg):
    import jax

    from leopard_tpu.models import vlm

    if profile == "8b":
        import pickle

        with open("/tmp/leopard8b_host_params.pkl", "rb") as f:
            host = pickle.load(f)
        params = jax.device_put(host)
        jax.block_until_ready(params)
        return params
    return vlm.init_params(cfg, jax.random.PRNGKey(0))


def main(phase="decode", profile="1.5b", steps=32, seq=4096, n_tiles=16,
         batch=1, trace_dir="/tmp/leopard_profile_inference", quantize=False):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from functools import partial

    from __graft_entry__ import _flagship_single_chip_cfg
    from leopard_tpu import config as cfgs
    from leopard_tpu.inference.engine import _prefill
    from leopard_tpu.models import vlm
    from leopard_tpu.models.decoder import KVCache

    cfg = cfgs.leopard_llava_8b() if profile == "8b" else _flagship_single_chip_cfg()
    params = _load_params(profile, cfg)
    quant_kv = profile == "8b" or quantize
    if quantize:
        from leopard_tpu.ops.quant import quantize_tree

        params = dict(params, text=quantize_tree(params["text"]))

    if phase == "encoder":
        images = jnp.asarray(
            np.random.RandomState(0).randn(n_tiles, 3, cfg.vision.image_size,
                                           cfg.vision.image_size), jnp.bfloat16
        )

        @jax.jit
        def run(params, images):
            return vlm.encode_images(params, cfg, images)

        np.asarray(run(params, images))
        with jax.profiler.trace(trace_dir):
            np.asarray(run(params, images))
    elif phase == "prefill":
        ids = np.full((1, seq), 11, np.int32)
        ids[0, 8 : 8 + n_tiles * cfg.anyres.tokens_per_tile] = cfg.image_token_id
        tokens = jnp.asarray(ids)
        seg = jnp.ones((1, seq), jnp.int32)
        images = jnp.asarray(
            np.random.RandomState(0).randn(n_tiles, 3, cfg.vision.image_size,
                                           cfg.vision.image_size), jnp.bfloat16
        )

        @jax.jit
        def run(params, tokens, seg, images, cache):
            feats = vlm.encode_images(params, cfg, images)
            return _prefill(params, cfg, tokens, seg, cache, feats, fresh=True)

        def fresh_args():
            return (params, tokens, seg, images,
                    KVCache.create(cfg.text, 1, seq + 256, quantized=quant_kv))

        np.asarray(run(*fresh_args())[0])
        with jax.profiler.trace(trace_dir):
            np.asarray(run(*fresh_args())[0])
    else:
        @partial(jax.jit, donate_argnums=(3,))
        def run(params, tok, seg, cache):
            def step(c, _):
                logits, c2 = vlm.forward(params, cfg, tok, segment_ids=seg,
                                         cache=c)
                return c2, logits[:, 0, 0]
            cache2, ys = jax.lax.scan(step, cache, jnp.arange(steps))
            return ys, cache2

        tok = jnp.ones((batch, 1), jnp.int32)
        seg = jnp.ones((batch, 1), jnp.int32)
        cache = KVCache.create(cfg.text, batch, seq + 256, quantized=quant_kv)
        ys, cache = run(params, tok, seg, cache)
        np.asarray(ys)
        cache = KVCache.create(cfg.text, batch, seq + 256, quantized=quant_kv)
        with jax.profiler.trace(trace_dir):
            ys, _ = run(params, tok, seg, cache)
            np.asarray(ys)

    print(f"--- {phase} ({profile}, batch {batch}) op table ---")
    op_table(trace_dir)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--phase", choices=("prefill", "decode", "encoder"),
                   default="decode")
    p.add_argument("--profile", choices=("1.5b", "8b"), default="1.5b")
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--seq", type=int, default=4096)
    p.add_argument("--tiles", type=int, default=16)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--quantize", action="store_true",
                   help="int8 weight-only + int8 KV (like Engine quantize)")
    a = p.parse_args()
    main(a.phase, a.profile, a.steps, a.seq, a.tiles, a.batch,
         quantize=a.quantize)
