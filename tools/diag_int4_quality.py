"""int4 quality at the 8B flagship: prefill-logit agreement vs the int8
engine on the same (tiled-random) weights (VERDICT r3 item 3's quality
statement; 8B bf16 does not fit one 16 GB v5e, so int8 — itself >0.999
logit-correlated with bf16 at 1.5B, tests/test_quant.py — is the anchor).

Loads the int8 host params, computes last-position prefill logits for a
fixed prompt, frees them, loads the int4 params (same underlying f32
weights, quantized per ops/quant.py's int4 layout), recomputes, and prints
correlation / top-k agreement. Both pickles come from tools/bench_8b.py
(run it with --quantize int8/int4 first, or this builds them).
"""

import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _params(cfg, quantize):
    from bench_8b import build_host_params

    path = f"/tmp/leopard8b_host_params_{quantize}.pkl"
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    host = build_host_params(cfg, quantize_text=quantize)
    with open(path, "wb") as f:
        pickle.dump(host, f, protocol=4)
    return host


def main(seq=2048, topks=(1, 5)):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from leopard_tpu import config as cfgs
    from leopard_tpu.inference.engine import _prefill
    from leopard_tpu.models.decoder import KVCache

    cfg = cfgs.leopard_llava_8b()
    ids = np.random.RandomState(0).randint(1, 120000, (1, seq)).astype(np.int32)
    ids[0, 0] = 128000
    tokens = jnp.asarray(ids)
    seg = jnp.ones((1, seq), jnp.int32)

    # logits at MANY positions, not just the last: run _prefill per suffix
    # length? One pass suffices — compare the last-position logits of 8
    # nested prefix lengths by re-running prefill on truncations.
    lens = [256, 512, 1024, 2048]
    out = {}
    for mode in ("int8", "int4"):
        print(f"loading {mode} host params...", flush=True)
        host = _params(cfg, mode)
        params = jax.device_put(host)
        jax.block_until_ready(params)
        del host
        rows = []
        for L in lens:
            cache = KVCache.create(cfg.text, 1, 2048 + 512, quantized=True)
            logits, _ = _prefill(
                params, cfg, tokens[:, :L], seg[:, :L], cache, None,
                fresh=True,
            )
            rows.append(np.asarray(logits[0], np.float64))
        out[mode] = rows
        del params
        # drop device buffers before loading the other tree
        import gc

        gc.collect()
        time.sleep(1)

    for L, a, b in zip(lens, out["int8"], out["int4"]):
        corr = np.corrcoef(a, b)[0, 1]
        parts = [f"ctx {L:5d}: corr {corr:.5f}"]
        order_a = np.argsort(a)[::-1]
        order_b = np.argsort(b)[::-1]
        for k in topks:
            inter = len(set(order_a[:k].tolist()) & set(order_b[:k].tolist()))
            parts.append(f"top{k} overlap {inter}/{k}")
        parts.append(f"argmax {'==' if order_a[0] == order_b[0] else '!='}")
        print("  " + "  ".join(parts), flush=True)


if __name__ == "__main__":
    main()
