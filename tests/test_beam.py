"""Beam search tests (tiny model, CPU)."""

import jax
import numpy as np

from leopard_tpu import config as cfgs
from leopard_tpu.config import GenerateConfig
from leopard_tpu.inference.beam import beam_search
from leopard_tpu.inference.engine import Engine
from leopard_tpu.models import vlm


def _engine():
    cfg = cfgs.tiny_vlm()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, Engine(cfg, params, seq_buckets=(16, 32), tile_buckets=(1,))


def test_beam_width_1_matches_greedy():
    cfg, eng = _engine()
    prompt = np.array([5, 1, 30, 99], np.int32)
    gen = GenerateConfig(max_new_tokens=4, greedy=True, eos_token_ids=(999999,))
    greedy = eng.generate([prompt], gen_cfg=gen).tokens[0]
    beam = beam_search(
        eng, prompt, beam_width=1, max_new_tokens=4, eos_ids=(999999,)
    )
    np.testing.assert_array_equal(beam, greedy)


def test_beam_search_returns_higher_or_equal_score():
    """Wider beams must never produce a lower total log-prob than greedy."""
    import jax.numpy as jnp

    from leopard_tpu.models import decoder

    cfg, eng = _engine()
    prompt = np.array([9, 3, 77], np.int32)

    def seq_logprob(gen_tokens):
        seq = np.concatenate([prompt, gen_tokens])
        logits, _ = decoder.forward(
            eng.params["text"], cfg.text, jnp.asarray(seq[None], jnp.int32)
        )
        lp = jax.nn.log_softmax(logits[0].astype(jnp.float32))
        total = 0.0
        for t in range(len(prompt) - 1, len(seq) - 1):
            total += float(lp[t, seq[t + 1]])
        return total

    greedy = eng.generate(
        [prompt],
        gen_cfg=GenerateConfig(max_new_tokens=3, greedy=True, eos_token_ids=(999999,)),
    ).tokens[0]
    beam = beam_search(eng, prompt, beam_width=4, max_new_tokens=3,
                       eos_ids=(999999,), length_penalty=0.0)
    assert len(beam) == 3
    assert seq_logprob(np.asarray(beam)) >= seq_logprob(np.asarray(greedy)) - 1e-4
