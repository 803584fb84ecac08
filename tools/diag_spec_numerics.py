"""Diagnose spec-decode divergence on TPU: is it logic or batch-width
numerics?

Path A: plain greedy decode, 9 tokens one at a time (width-1 forwards).
Path B: from the SAME post-prefill cache, one width-8 verify forward fed
        path A's own tokens t0..t7. In exact arithmetic, argmax(B.logits[j])
        == A.token[j+1] for every j. Any mismatch is pure numerics (the
        logic is shared with plain decode: same vlm.forward, same cache
        invariant slot==position).

Prints per-position argmax agreement and the logit delta at each position.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(prompt_len=512, width=8):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_single_chip_cfg
    from leopard_tpu.config import GenerateConfig
    from leopard_tpu.inference.engine import Engine
    from leopard_tpu.models import vlm

    cfg = _flagship_single_chip_cfg()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    engine = Engine(cfg, params, seq_buckets=(prompt_len,), tile_buckets=(0,))
    gen = GenerateConfig(max_new_tokens=width + 1, greedy=True,
                         eos_token_ids=(999999,))

    rng = np.random.RandomState(0)
    p = rng.randint(1, 1000, prompt_len - 8).astype(np.int32)
    pat = rng.randint(1, 1000, 6).astype(np.int32)
    p[-180:] = np.tile(pat, 30)

    # Path A: plain greedy, width-1 decode steps
    res = engine.generate([p], gen_cfg=gen)
    toks_a = np.asarray(res.tokens[0])
    print("plain tokens:", toks_a.tolist())

    # Path B: fresh prefill, then ONE width-`width` forward over toks_a[:-1]
    from leopard_tpu.inference.engine import _prefill
    from leopard_tpu.models.decoder import KVCache

    s = prompt_len
    tokens = np.zeros((1, s), np.int32)
    seg = np.zeros((1, s), np.int32)
    tokens[0, : len(p)] = p
    seg[0, : len(p)] = 1
    cache = KVCache.create(cfg.text, 1, 1024, quantized=False)
    first_logits, cache = _prefill(
        engine.params, cfg, jnp.asarray(tokens), jnp.asarray(seg), cache,
        None, fresh=True,
    )
    t0 = int(np.argmax(np.asarray(first_logits[0])))
    assert t0 == toks_a[0], (t0, toks_a[0])

    verify_in = jnp.asarray(toks_a[:width][None, :], jnp.int32)
    logits_b, _ = vlm.forward(
        engine.params, cfg, verify_in,
        segment_ids=jnp.ones((1, width), jnp.int32), cache=cache,
    )
    logits_b = np.asarray(logits_b[0], np.float32)  # [width, V]
    pred_b = np.argmax(logits_b, axis=-1)

    # Path C: same positions via width-1 steps (plain decode's own logits)
    cache_c = cache
    logits_c = []
    for j in range(width):
        lj, cache_c = vlm.forward(
            engine.params, cfg, verify_in[:, j : j + 1],
            segment_ids=jnp.ones((1, 1), jnp.int32), cache=cache_c,
        )
        logits_c.append(np.asarray(lj[0, 0], np.float32))
    logits_c = np.stack(logits_c)
    pred_c = np.argmax(logits_c, axis=-1)

    print(f"{'pos':>3} {'A(plain)':>9} {'B(w8)':>9} {'C(w1)':>9} "
          f"{'max|B-C|':>9} {'margin_C':>9} agree")
    for j in range(width):
        srt = np.sort(logits_c[j])[-2:]
        margin = srt[1] - srt[0]
        dmax = np.abs(logits_b[j] - logits_c[j]).max()
        print(f"{j:>3} {toks_a[j + 1]:>9} {pred_b[j]:>9} {pred_c[j]:>9} "
              f"{dmax:>9.4f} {margin:>9.4f} "
              f"{'OK' if pred_b[j] == toks_a[j + 1] else 'MISMATCH'}")


if __name__ == "__main__":
    main()
