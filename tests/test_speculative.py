"""Prompt-lookup speculative decoding: token-identical to plain greedy
decode (it only accepts tokens the model itself would emit), across
repetitive prompts (high acceptance), random prompts (≈0 acceptance),
eos mid-batch, budget edges, images, and the int8 KV cache."""

import jax
import numpy as np

from leopard_tpu import config as cfgs
from leopard_tpu.config import GenerateConfig
from leopard_tpu.inference.engine import Engine
from leopard_tpu.inference.speculative import SpecConfig, _propose
from leopard_tpu.models import vlm


def _tiny():
    cfg = cfgs.tiny_vlm()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _assert_spec_matches(eng, prompts, gen, spec, images=None):
    want = eng.generate(prompts, images=images, gen_cfg=gen)
    got = eng.generate(prompts, images=images, gen_cfg=gen, spec=spec)
    for i, (w, g) in enumerate(zip(want.tokens, got.tokens)):
        np.testing.assert_array_equal(g, w, err_msg=f"row {i}")
        np.testing.assert_allclose(
            got.logprobs[i], want.logprobs[i], rtol=1e-5, atol=1e-5,
            err_msg=f"row {i} logprobs",
        )


def test_propose_finds_most_recent_continuation():
    import jax.numpy as jnp

    # history: ... [7 8] 9 ... [7 8] 4 5 | suffix ends with [7 8]
    hist = np.zeros((1, 32), np.int32)
    row = [1, 7, 8, 9, 2, 3, 7, 8, 4, 5, 6, 7, 8]
    hist[0, : len(row)] = row
    draft = _propose(jnp.asarray(hist), jnp.asarray([len(row)], jnp.int32),
                     ngram=2, k=3)
    # most recent earlier [7 8] is at idx 6 → continuation 4, 5, 6
    np.testing.assert_array_equal(np.asarray(draft)[0], [4, 5, 6])


def test_propose_no_match_repeats_last():
    import jax.numpy as jnp

    hist = np.zeros((1, 16), np.int32)
    hist[0, :5] = [1, 2, 3, 4, 5]
    draft = _propose(jnp.asarray(hist), jnp.asarray([5], jnp.int32),
                     ngram=2, k=4)
    np.testing.assert_array_equal(np.asarray(draft)[0], [5, 5, 5, 5])


def test_spec_matches_greedy_random_prompts():
    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(16, 32), tile_buckets=(1,))
    gen = GenerateConfig(max_new_tokens=12, greedy=True, eos_token_ids=(0,))
    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, 100, n).astype(np.int32) for n in (5, 9, 13)]
    _assert_spec_matches(eng, prompts, gen, SpecConfig(ngram=2, draft=4))


def test_spec_matches_greedy_repetitive_prompts():
    # repeated n-grams → drafts actually fire and get accepted
    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(32,), tile_buckets=(1,))
    gen = GenerateConfig(max_new_tokens=16, greedy=True, eos_token_ids=(0,))
    base = np.array([3, 14, 15, 9, 2, 6], np.int32)
    prompts = [
        np.tile(base, 4),
        np.concatenate([base, base, [7, 7], base]).astype(np.int32),
    ]
    _assert_spec_matches(eng, prompts, gen, SpecConfig(ngram=2, draft=4))


def test_spec_eos_mid_batch_and_budget_edge():
    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(16,), tile_buckets=(1,))
    rng = np.random.RandomState(3)
    prompts = [rng.randint(1, 100, n).astype(np.int32) for n in (4, 8)]
    # wide eos set → some row stops early; max_new=1 and 2 exercise the
    # budget clamp inside a draft block
    for eos in ((0,), tuple(range(0, 50))):
        for max_new in (1, 2, 5, 16):
            gen = GenerateConfig(max_new_tokens=max_new, greedy=True,
                                 eos_token_ids=eos)
            _assert_spec_matches(eng, prompts, gen,
                                 SpecConfig(ngram=2, draft=4))


def test_spec_with_images_matches():
    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(16, 32), tile_buckets=(1,))
    gen = GenerateConfig(max_new_tokens=10, greedy=True, eos_token_ids=(0,))
    rng = np.random.RandomState(5)
    prompt = rng.randint(1, 100, 12).astype(np.int32)
    prompt[2:6] = cfg.image_token_id
    images = rng.randn(1, 3, 56, 56).astype(np.float32)
    _assert_spec_matches(eng, [prompt], gen, SpecConfig(ngram=2, draft=3),
                         images=images)


def test_spec_int8_kv_matches():
    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(16,), tile_buckets=(1,),
                 quantize_kv=True)
    gen = GenerateConfig(max_new_tokens=12, greedy=True, eos_token_ids=(0,))
    rng = np.random.RandomState(7)
    prompts = [rng.randint(1, 100, n).astype(np.int32) for n in (6, 11)]
    _assert_spec_matches(eng, prompts, gen, SpecConfig(ngram=2, draft=4))


def test_spec_rejects_sampling():
    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(16,), tile_buckets=(1,))
    gen = GenerateConfig(max_new_tokens=4, greedy=False, temperature=0.7)
    try:
        eng.generate([np.arange(1, 6, dtype=np.int32)], gen_cfg=gen,
                     spec=SpecConfig())
        assert False, "expected assertion"
    except AssertionError as e:
        assert "greedy" in str(e)


def test_spec_cache_headroom_at_bucket_boundary():
    """ADVICE r3 (medium): with prompt == bucket and (s + max_new) an exact
    multiple of 512, the cache used to be sized with NO headroom for the
    verify block — the last rounds' per-row DUS writes clamped and
    overwrote live KV, silently diverging from plain greedy near the end.
    eos (-1,) never fires so decode runs the full budget."""
    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(16,), tile_buckets=(1,))
    gen = GenerateConfig(max_new_tokens=496, greedy=True,
                         eos_token_ids=(-1,))
    rng = np.random.RandomState(11)
    prompts = [rng.randint(1, 100, 16).astype(np.int32)]
    _assert_spec_matches(eng, prompts, gen, SpecConfig(ngram=2, draft=7))


def test_spec_tight_max_cache_rejected():
    cfg, params = _tiny()
    eng = Engine(cfg, params, seq_buckets=(16,), tile_buckets=(1,))
    gen = GenerateConfig(max_new_tokens=16, greedy=True, eos_token_ids=(0,))
    try:
        eng.generate([np.arange(1, 9, dtype=np.int32)], gen_cfg=gen,
                     spec=SpecConfig(draft=7), max_cache=32)
        assert False, "expected assertion"
    except AssertionError as e:
        assert "headroom" in str(e)
