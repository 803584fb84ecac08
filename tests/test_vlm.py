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
