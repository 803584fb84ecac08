"""VLM assembly + inference engine tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from leopard_tpu import config as cfgs
from leopard_tpu.config import GenerateConfig
from leopard_tpu.inference.engine import Engine
from leopard_tpu.models import decoder, vlm
from leopard_tpu.models.decoder import KVCache


def _tiny():
    cfg = cfgs.tiny_vlm()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_splice_replaces_image_positions():
    embeds = jnp.zeros((1, 6, 4))
    feats = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4) + 1
    is_img = jnp.array([[False, True, True, True, False, True]])
    out = vlm.splice_image_features(embeds, feats, is_img)
    flat = feats.reshape(-1, 4)
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(flat[0]))
    np.testing.assert_allclose(np.asarray(out[0, 3]), np.asarray(flat[2]))
    np.testing.assert_allclose(np.asarray(out[0, 5]), np.asarray(flat[3]))
    np.testing.assert_allclose(np.asarray(out[0, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(out[0, 4]), 0.0)


def test_splice_batch_order():
    embeds = jnp.zeros((2, 3, 4))
    feats = (jnp.arange(2, dtype=jnp.float32)[:, None, None] + 1) * jnp.ones((2, 1, 4))
    is_img = jnp.array([[False, True, False], [True, False, False]])
    out = vlm.splice_image_features(embeds, feats, is_img)
    assert float(out[0, 1, 0]) == 1.0  # first image token → first feature row
    assert float(out[1, 0, 0]) == 2.0


def test_vlm_forward_with_images():
    cfg, params = _tiny()
    # tile 56×56 with patch 14 → 4×4=16 patches → pixel shuffle → 4 tokens/tile
    images = np.random.RandomState(0).randn(2, 3, 56, 56).astype(np.float32)
    img_tok = cfg.image_token_id
    tokens = np.array([[1, img_tok, img_tok, img_tok, img_tok,
                        img_tok, img_tok, img_tok, img_tok, 5, 7]], dtype=np.int32)
    logits, _ = vlm.forward(params, cfg, jnp.asarray(tokens), images=jnp.asarray(images))
    assert logits.shape == (1, 11, cfg.text.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_vlm_image_features_change_output():
    cfg, params = _tiny()
    img_tok = cfg.image_token_id
    tokens = jnp.asarray([[1, img_tok, img_tok, img_tok, img_tok, 5]], dtype=jnp.int32)
    img_a = jnp.asarray(np.random.RandomState(1).randn(1, 3, 56, 56), jnp.float32)
    img_b = jnp.asarray(np.random.RandomState(2).randn(1, 3, 56, 56), jnp.float32)
    la, _ = vlm.forward(params, cfg, tokens, images=img_a)
    lb, _ = vlm.forward(params, cfg, tokens, images=img_b)
    # logits at/after the image differ, before the image identical (causality)
    assert not np.allclose(np.asarray(la[:, -1]), np.asarray(lb[:, -1]))
    np.testing.assert_allclose(np.asarray(la[:, 0]), np.asarray(lb[:, 0]), atol=1e-5)


def test_ragged_batch_cache_decode_matches_single():
    """Right-padded ragged prefill + per-row cache offsets must reproduce each
    row's unpadded logits."""
    cfg, params = _tiny()
    tcfg = cfg.text
    p1 = np.array([3, 17, 9, 200, 11], np.int32)
    p2 = np.array([8, 42], np.int32)

    def single(prompt, steps=3):
        toks = prompt[None]
        cache = KVCache.create(tcfg, 1, 16, dtype=jnp.float32)
        logits, cache = decoder.forward(params["text"], tcfg, jnp.asarray(toks), cache=cache)
        outs = [np.asarray(logits[0, -1])]
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        for _ in range(steps - 1):
            logits, cache = decoder.forward(params["text"], tcfg, tok[:, None], cache=cache)
            outs.append(np.asarray(logits[0, 0]))
            tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
        return np.stack(outs)

    want1, want2 = single(p1), single(p2)

    # batched ragged
    tokens = np.zeros((2, 5), np.int32)
    seg = np.zeros((2, 5), np.int32)
    tokens[0, :5], seg[0, :5] = p1, 1
    tokens[1, :2], seg[1, :2] = p2, 1
    cache = KVCache.create(tcfg, 2, 16, dtype=jnp.float32)
    logits, cache = decoder.forward(
        params["text"], tcfg, jnp.asarray(tokens), segment_ids=jnp.asarray(seg), cache=cache
    )
    lengths = jnp.asarray([5, 2])
    last = jnp.take_along_axis(logits, (lengths - 1)[:, None, None], axis=1)[:, 0]
    got = [np.asarray(last)]
    tok = jnp.argmax(last, -1).astype(jnp.int32)
    for _ in range(2):
        logits, cache = decoder.forward(params["text"], tcfg, tok[:, None], cache=cache)
        got.append(np.asarray(logits[:, 0]))
        tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
    got = np.stack(got, axis=1)  # [B, steps, V]
    np.testing.assert_allclose(got[0], want1, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1], want2, rtol=2e-4, atol=2e-4)


def test_engine_generate_text_only():
    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(16, 32), tile_buckets=(1, 2, 4))
    gen = GenerateConfig(max_new_tokens=4, greedy=True, eos_token_ids=(0,))
    res = eng.generate(
        [np.array([1, 2, 3], np.int32), np.array([9, 8, 7, 6, 5], np.int32)],
        gen_cfg=gen,
    )
    assert len(res.tokens) == 2
    assert all(len(t) <= 4 for t in res.tokens)


def test_engine_generate_matches_full_forward_greedy():
    """Engine greedy decode == argmax over repeated full forward passes."""
    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(8, 16, 32), tile_buckets=(1,))
    gen = GenerateConfig(max_new_tokens=3, greedy=True, eos_token_ids=(999999,))
    prompt = np.array([5, 1, 30, 99], np.int32)
    res = eng.generate([prompt], gen_cfg=gen)

    # oracle: repeated full forward
    seq = list(prompt)
    for _ in range(3):
        logits, _ = decoder.forward(
            params["text"], cfg.text, jnp.asarray([seq], dtype=jnp.int32)
        )
        seq.append(int(jnp.argmax(logits[0, -1])))
    np.testing.assert_array_equal(res.tokens[0], np.array(seq[4:], np.int32))


def test_engine_generate_with_images():
    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(16, 32), tile_buckets=(1, 2, 4))
    gen = GenerateConfig(max_new_tokens=3, greedy=True, eos_token_ids=(999999,))
    img_tok = cfg.image_token_id
    prompt = np.array([1] + [img_tok] * 4 + [5, 7], np.int32)
    images = np.random.RandomState(0).randn(1, 3, 56, 56).astype(np.float32)
    res = eng.generate([prompt], images=images, gen_cfg=gen)
    assert len(res.tokens[0]) == 3


def test_fresh_prefill_matches_cached_dense():
    """fresh_cache=True (uncached-tier attention during single-shot prefill)
    must produce the same logits AND the same cache contents as the dense
    masked sweep over the cache buffer, for ragged rows, in both the bf16 and
    int8 cache modes — then decode must continue identically from it."""
    import dataclasses

    from leopard_tpu import config as cfgs
    from leopard_tpu.models import vlm as vlm_mod

    cfg = cfgs.tiny_vlm()
    tcfg = cfg.text
    params = vlm_mod.init_params(cfg, jax.random.PRNGKey(3))
    b, s = 2, 12
    rng = np.random.RandomState(11)
    tokens = jnp.asarray(rng.randint(1, 90, (b, s)).astype(np.int32))
    seg = jnp.asarray(
        (np.arange(s)[None, :] < np.asarray([[s], [s - 3]])).astype(np.int32)
    )

    for quant in (False, True):
        caches = {}
        logits = {}
        for fresh in (False, True):
            cache = KVCache.create(tcfg, b, 24, quantized=quant)
            out, cache = vlm_mod.forward(
                params, cfg, tokens, segment_ids=seg, cache=cache,
                fresh_cache=fresh,
            )
            caches[fresh], logits[fresh] = cache, out
        # quant: the fresh path attends over exact bf16/f32 k/v while the
        # dense cached path attends over their int8 dequantization — the
        # difference is bounded quantization noise, not a bug
        tol = dict(rtol=5e-2, atol=5e-2) if quant else dict(rtol=2e-4, atol=2e-4)
        # padded positions produce unspecified logits in both paths (their
        # queries are fully masked) — compare valid positions only
        valid = np.asarray(seg, bool)[:, :, None]
        np.testing.assert_allclose(
            np.where(valid, np.asarray(logits[True]), 0.0),
            np.where(valid, np.asarray(logits[False]), 0.0),
            **tol,
        )
        np.testing.assert_array_equal(
            np.asarray(caches[True].seg), np.asarray(caches[False].seg)
        )
        np.testing.assert_array_equal(
            np.asarray(caches[True].index), np.asarray(caches[False].index)
        )
        # k/v at PAD slots hold garbage derived from fully-masked attention
        # outputs (differs between paths, never attended) — compare valid
        # slots only. seg is [B, S_max]; k/v are [L, B, S_max, H, D]. In
        # quant mode, deeper layers' k/v legitimately drift a little (the
        # fresh path's attention inputs are exact, the dense cached path's
        # are dequantized int8) — compare DEQUANTIZED values, loose tol.
        vslot = np.asarray(caches[False].seg) != 0  # [B, S_max]

        def deq(c, name):
            a = np.asarray(getattr(c, name), np.float32)
            if quant:
                a = a * np.asarray(getattr(c, name + "_scale"), np.float32)[..., None]
            return a

        m = vslot[None, :, :, None, None]
        ctol = dict(rtol=5e-2, atol=5e-2) if quant else dict(rtol=1e-5, atol=1e-5)
        for name in ("k", "v"):
            np.testing.assert_allclose(
                np.where(m, deq(caches[True], name), 0.0),
                np.where(m, deq(caches[False], name), 0.0),
                **ctol, err_msg=f"cache field {name} (quant={quant})",
            )
        # one decode step from each cache must agree
        nxt = jnp.asarray(rng.randint(1, 90, (b, 1)).astype(np.int32))
        o_fresh, _ = vlm_mod.forward(
            params, cfg, nxt, segment_ids=jnp.ones((b, 1), jnp.int32),
            cache=caches[True],
        )
        o_dense, _ = vlm_mod.forward(
            params, cfg, nxt, segment_ids=jnp.ones((b, 1), jnp.int32),
            cache=caches[False],
        )
        np.testing.assert_allclose(
            np.asarray(o_fresh), np.asarray(o_dense), **ctol
        )


def test_fresh_prefill_long_seq_chunked_tier():
    """At s >= long_seq_threshold the fresh path takes the chunked tier on
    CPU — logits must still match the dense cached sweep."""
    import dataclasses

    from leopard_tpu import config as cfgs
    from leopard_tpu.models import vlm as vlm_mod

    cfg = cfgs.tiny_vlm()
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, long_seq_threshold=16)
    )
    tcfg = cfg.text
    params = vlm_mod.init_params(cfg, jax.random.PRNGKey(4))
    b, s = 2, 32
    rng = np.random.RandomState(13)
    tokens = jnp.asarray(rng.randint(1, 90, (b, s)).astype(np.int32))
    seg = jnp.asarray(
        (np.arange(s)[None, :] < np.asarray([[s], [s - 5]])).astype(np.int32)
    )
    outs = {}
    for fresh in (False, True):
        cache = KVCache.create(tcfg, b, 40)
        out, _ = vlm_mod.forward(
            params, cfg, tokens, segment_ids=seg, cache=cache,
            fresh_cache=fresh,
        )
        outs[fresh] = out
    valid = np.asarray(seg, bool)[:, :, None]  # pad logits are unspecified
    np.testing.assert_allclose(
        np.where(valid, np.asarray(outs[True]), 0.0),
        np.where(valid, np.asarray(outs[False]), 0.0),
        rtol=3e-4, atol=3e-4,
    )


def test_cache_scatter_and_dus_store_agree():
    """The two in-place cache-update formulations (chosen by a static shape
    heuristic in decoder._layer) must produce identical results: a decode
    step with cache_len 4096 at batch 4 (scatter branch: b·S_max ≥ 16384)
    must match cache_len 64 (DUS branch) on the same tokens."""
    from leopard_tpu import config as cfgs
    from leopard_tpu.models import vlm as vlm_mod

    cfg = cfgs.tiny_vlm()
    tcfg = cfg.text
    params = vlm_mod.init_params(cfg, jax.random.PRNGKey(6))
    b, s = 4, 8
    rng = np.random.RandomState(17)
    tokens = jnp.asarray(rng.randint(1, 90, (b, s)).astype(np.int32))
    nxt = jnp.asarray(rng.randint(1, 90, (b, 1)).astype(np.int32))
    outs = {}
    for cache_len in (64, 4096):
        cache = KVCache.create(tcfg, b, cache_len)
        _, cache = vlm_mod.forward(params, cfg, tokens, cache=cache)
        out, cache = vlm_mod.forward(
            params, cfg, nxt, segment_ids=jnp.ones((b, 1), jnp.int32),
            cache=cache,
        )
        outs[cache_len] = out
        # the written slots must hold the same values regardless of branch
        np.testing.assert_array_equal(
            np.asarray(cache.index), np.full((b,), s + 1, np.int32)
        )
    np.testing.assert_allclose(
        np.asarray(outs[4096]), np.asarray(outs[64]), rtol=1e-5, atol=1e-5
    )


def test_fresh_prefill_sliding_window_matches_dense():
    """The fresh-cache prefill tiers must apply the sliding window (round-1's
    silent-window-drop bug class): long-seq chunked tier + short dense tier
    vs the cached dense sweep, Mistral-style window."""
    import dataclasses

    from leopard_tpu import config as cfgs
    from leopard_tpu.models import vlm as vlm_mod

    cfg = cfgs.tiny_vlm()
    cfg = dataclasses.replace(
        cfg,
        text=dataclasses.replace(
            cfg.text, sliding_window=6, long_seq_threshold=16
        ),
    )
    tcfg = cfg.text
    params = vlm_mod.init_params(cfg, jax.random.PRNGKey(8))
    rng = np.random.RandomState(19)
    for b, s in ((2, 32), (2, 8)):  # chunked tier / dense tier
        tokens = jnp.asarray(rng.randint(1, 90, (b, s)).astype(np.int32))
        outs = {}
        for fresh in (False, True):
            cache = KVCache.create(tcfg, b, s + 8)
            out, _ = vlm_mod.forward(
                params, cfg, tokens, cache=cache, fresh_cache=fresh
            )
            outs[fresh] = np.asarray(out)
        np.testing.assert_allclose(outs[True], outs[False],
                                   rtol=3e-4, atol=3e-4)
        # and the window actually bites: full attention differs
        nw = dataclasses.replace(
            cfg, text=dataclasses.replace(tcfg, sliding_window=None)
        )
        cache = KVCache.create(tcfg, b, s + 8)
        out_nw, _ = vlm_mod.forward(params, nw, tokens, cache=cache,
                                    fresh_cache=True)
        if s > 6:
            assert not np.allclose(outs[True], np.asarray(out_nw),
                                   rtol=3e-4, atol=3e-4)


def test_engine_chunked_prefill_matches_single_shot():
    """Prompts above the largest seq bucket prefill in chunk-sized pieces
    (first chunk fresh, later chunks through the continuation tier), with
    image features spliced across chunk boundaries via per-row feature
    offsets. Greedy output must match a single-shot prefill engine."""
    import dataclasses

    cfg, params = _tiny()
    # low threshold so the continuation chunks exercise chunked_cont
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, long_seq_threshold=8,
                                      attn_chunk_size=8)
    )
    img_tok = cfg.image_token_id
    rng = np.random.RandomState(7)
    # row 0: 2 tiles (8 image tokens), second tile spanning the 16-token
    # chunk boundary; row 1: 1 tile, shorter prompt (ragged final chunks)
    p0 = list(rng.randint(1, 100, 10)) + [img_tok] * 4 + \
        list(rng.randint(1, 100, 0)) + [img_tok] * 4 + \
        list(rng.randint(1, 100, 22))            # len 40, img at 10-17
    p1 = list(rng.randint(1, 100, 3)) + [img_tok] * 4 + \
        list(rng.randint(1, 100, 13))            # len 20
    prompts = [np.asarray(p0, np.int32), np.asarray(p1, np.int32)]
    images = rng.randn(3, 3, 56, 56).astype(np.float32)

    gen = GenerateConfig(max_new_tokens=4, greedy=True, eos_token_ids=(999999,))
    single = Engine(cfg, params, seq_buckets=(64,), tile_buckets=(4,))
    chunked = Engine(cfg, params, seq_buckets=(16,), tile_buckets=(4,))
    want = single.generate(prompts, images=images, gen_cfg=gen)
    got = chunked.generate(prompts, images=images, gen_cfg=gen)
    for w, g in zip(want.tokens, got.tokens):
        np.testing.assert_array_equal(w, g)
