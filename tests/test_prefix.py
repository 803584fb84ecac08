"""Prefix caching (Engine.build_prefix / generate(prefix=...)): the shared
prefix is prefilled once, seeded into every batch row, and the suffix runs a
continuation prefill — tokens must match the full-prompt path exactly (CPU
f32 is deterministic; the cache invariant slot == absolute position makes
RoPE/masking identical by construction)."""

import jax
import numpy as np

from leopard_tpu import config as cfgs
from leopard_tpu.config import GenerateConfig
from leopard_tpu.inference.engine import Engine
from leopard_tpu.models import vlm


def _tiny():
    cfg = cfgs.tiny_vlm()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


GEN = GenerateConfig(max_new_tokens=6, greedy=True, eos_token_ids=(0,))


def _suffixes(rng, n=3):
    return [rng.randint(1, 100, int(rng.randint(3, 9))).astype(np.int32)
            for _ in range(n)]


def test_prefix_matches_full_prompt_text():
    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(16, 32, 64), tile_buckets=(1,))
    rng = np.random.RandomState(0)
    pre = rng.randint(1, 100, 21).astype(np.int32)
    sfx = _suffixes(rng)

    full = eng.generate([np.concatenate([pre, s]) for s in sfx], gen_cfg=GEN)
    prefix = eng.build_prefix(pre)
    assert prefix.length == 21
    got = eng.generate(sfx, gen_cfg=GEN, prefix=prefix)
    for i, (g, w) in enumerate(zip(got.tokens, full.tokens)):
        np.testing.assert_array_equal(g, w, err_msg=f"row {i}")

    # the prefix object is reusable: a second batch must also match
    sfx2 = _suffixes(rng, n=2)
    full2 = eng.generate([np.concatenate([pre, s]) for s in sfx2], gen_cfg=GEN)
    got2 = eng.generate(sfx2, gen_cfg=GEN, prefix=prefix)
    for g, w in zip(got2.tokens, full2.tokens):
        np.testing.assert_array_equal(g, w)


def test_prefix_with_images_matches_full_prompt():
    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(16, 32, 64), tile_buckets=(1,))
    rng = np.random.RandomState(1)
    pre = rng.randint(1, 100, 12).astype(np.int32)
    pre[2:6] = cfg.image_token_id                   # one 4-token tile
    images = rng.randn(1, 3, 56, 56).astype(np.float32)
    sfx = _suffixes(rng, n=2)

    full = eng.generate([np.concatenate([pre, s]) for s in sfx],
                        images=np.concatenate([images, images], axis=0),
                        gen_cfg=GEN)
    prefix = eng.build_prefix(pre, images=images)
    got = eng.generate(sfx, gen_cfg=GEN, prefix=prefix)
    for i, (g, w) in enumerate(zip(got.tokens, full.tokens)):
        np.testing.assert_array_equal(g, w, err_msg=f"row {i}")


def test_prefix_int8_kv_matches_full_prompt():
    # quantized KV: the prefix rows' int8 payload AND scales are seeded, so
    # dequantization is bit-identical to the full-prompt path
    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(16, 32, 64), tile_buckets=(1,),
                 quantize_kv=True)
    rng = np.random.RandomState(2)
    pre = rng.randint(1, 100, 30).astype(np.int32)
    sfx = _suffixes(rng)
    full = eng.generate([np.concatenate([pre, s]) for s in sfx], gen_cfg=GEN)
    got = eng.generate(sfx, gen_cfg=GEN, prefix=eng.build_prefix(pre))
    for g, w in zip(got.tokens, full.tokens):
        np.testing.assert_array_equal(g, w)


def test_prefix_bucket_larger_than_cache():
    # prefix bucketed to 64 slots but the target cache is smaller: only the
    # needed slots are copied (sp_keep clamp) and results still match
    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(8, 16, 64), tile_buckets=(1,))
    rng = np.random.RandomState(3)
    pre = rng.randint(1, 100, 17).astype(np.int32)   # buckets to 64
    sfx = [rng.randint(1, 100, 4).astype(np.int32)]
    gen = GenerateConfig(max_new_tokens=3, greedy=True, eos_token_ids=(0,))
    full = eng.generate([np.concatenate([pre, sfx[0]])], gen_cfg=gen)
    got = eng.generate(sfx, gen_cfg=gen, prefix=eng.build_prefix(pre))
    np.testing.assert_array_equal(got.tokens[0], full.tokens[0])


def test_prefix_idefics2_arch_matches_full_prompt():
    # prefix caching is architecture-agnostic: the Idefics2 decoder path
    # (Mistral-style, perceiver arch switch lives in vlm.forward) must give
    # the same parity
    import dataclasses

    base = cfgs.tiny_vlm()
    pcfg = cfgs.PerceiverConfig(
        num_latents=4, num_layers=1, hidden_size=base.text.hidden_size,
        num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=96,
        dtype="float32",
    )
    cfg = dataclasses.replace(
        base, perceiver=pcfg, architecture="leopard_idefics2",
        pixel_shuffle_factor=1,
        vision=dataclasses.replace(base.vision, image_size=56),
    )
    params = vlm.init_params(cfg, jax.random.PRNGKey(5))
    eng = Engine(cfg, params, seq_buckets=(16, 32, 64), tile_buckets=(1,))
    rng = np.random.RandomState(6)
    pre = rng.randint(1, 100, 23).astype(np.int32)
    sfx = _suffixes(rng, n=2)
    full = eng.generate([np.concatenate([pre, s]) for s in sfx], gen_cfg=GEN)
    got = eng.generate(sfx, gen_cfg=GEN, prefix=eng.build_prefix(pre))
    for g, w in zip(got.tokens, full.tokens):
        np.testing.assert_array_equal(g, w)


def test_continuous_with_prefix_matches_serial_full_prompt():
    # ContinuousEngine.run(prefix=...) — every staged prefill (single-row
    # AND block) seeds the shared prefix; tokens must equal serial
    # generation on the concatenated prompts
    from leopard_tpu.inference.continuous import ContinuousEngine, Request

    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(16, 32), tile_buckets=(1,))
    rng = np.random.RandomState(4)
    pre = rng.randint(1, 100, 19).astype(np.int32)
    sfx = _suffixes(rng, n=6)
    reqs = [Request(prompt=s, max_new_tokens=int(rng.randint(2, 7)))
            for s in sfx]

    want = []
    for r in reqs:
        g = GenerateConfig(max_new_tokens=r.max_new_tokens, greedy=True,
                           eos_token_ids=(0,))
        want.append(eng.generate([np.concatenate([pre, r.prompt])],
                                 gen_cfg=g).tokens[0])

    cont = ContinuousEngine(eng, slots=2, cache_len=512, max_new_cap=16,
                            segment_steps=2)
    got = cont.run(reqs, gen_cfg=GenerateConfig(greedy=True,
                                                eos_token_ids=(0,)),
                   prefix=eng.build_prefix(pre))
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(g.tokens, w, err_msg=f"request {i}")


def test_multiturn_conversation_matches_concatenated():
    # generate(return_prefix=True) hands back the post-decode KV as the next
    # turn's prefix; a 3-turn chat must be token-identical to re-prefilling
    # the whole concatenated conversation each turn
    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(16, 32, 64, 128), tile_buckets=(1,))
    rng = np.random.RandomState(7)
    gen = GenerateConfig(max_new_tokens=5, greedy=True, eos_token_ids=(0,))

    t1 = rng.randint(1, 100, 9).astype(np.int32)
    r1 = eng.generate([t1], gen_cfg=gen, return_prefix=True)
    np.testing.assert_array_equal(
        r1.prefix.tokens[: len(t1)], t1
    )
    assert r1.prefix.length == len(r1.prefix.tokens)

    t2 = rng.randint(1, 100, 7).astype(np.int32)
    r2 = eng.generate([t2], gen_cfg=gen, prefix=r1.prefix,
                      return_prefix=True)
    want2 = eng.generate([np.concatenate([r1.prefix.tokens, t2])],
                         gen_cfg=gen)
    np.testing.assert_array_equal(r2.tokens[0], want2.tokens[0])

    t3 = rng.randint(1, 100, 11).astype(np.int32)
    r3 = eng.generate([t3], gen_cfg=gen, prefix=r2.prefix)
    want3 = eng.generate([np.concatenate([r2.prefix.tokens, t3])],
                         gen_cfg=gen)
    np.testing.assert_array_equal(r3.tokens[0], want3.tokens[0])


def test_prefix_rejects_spec_and_penalty():
    import pytest

    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(16,), tile_buckets=(1,))
    pre = np.arange(1, 9, dtype=np.int32)
    prefix = eng.build_prefix(pre)
    from leopard_tpu.inference.speculative import SpecConfig

    with pytest.raises(AssertionError):
        eng.generate([pre], gen_cfg=GEN, prefix=prefix,
                     spec=SpecConfig(ngram=2, draft=4))
    with pytest.raises(AssertionError):
        eng.generate(
            [pre], prefix=prefix,
            gen_cfg=GenerateConfig(max_new_tokens=2, greedy=True,
                                   repetition_penalty=1.2,
                                   eos_token_ids=(0,)),
        )
