"""Text datasets, conversation templates, lm-eval adaptor, server handler."""

import json
import os

import numpy as np

from leopard_tpu.data.conversation import SeparatorStyle, get_template
from leopard_tpu.data.text_dataset import BlendedDataset, PackedLMDataset, TokenStore
from leopard_tpu.data.tokenizer import vocab_size_with_padding


def test_token_store_roundtrip(tmp_path):
    docs = [[1, 2, 3], [4, 5], [6, 7, 8, 9]]
    store = TokenStore.build(docs)
    assert store.num_documents == 3
    assert store.doc_length(1) == 2
    np.testing.assert_array_equal(store.doc_tokens(2), [6, 7, 8, 9])
    store.save(str(tmp_path))
    loaded = TokenStore.load(str(tmp_path))
    np.testing.assert_array_equal(loaded.tokens, store.tokens)


def test_packed_lm_dataset_covers_tokens():
    docs = [list(range(i * 10, i * 10 + 7)) for i in range(10)]  # 7-token docs
    store = TokenStore.build(docs)
    ds = PackedLMDataset(store, seq_len=8, num_samples=6, seed=0)
    assert len(ds) == 6
    for i in range(len(ds)):
        s = ds[i]
        assert s["tokens"].shape == (8,)
        assert s["targets"].shape == (8,)
        # targets are next-token shifted
        np.testing.assert_array_equal(s["targets"][:-1], s["tokens"][1:])


def test_packed_lm_dataset_deterministic():
    docs = [list(range(20))] * 5
    store = TokenStore.build(docs)
    a = PackedLMDataset(store, 16, 4, seed=3)
    b = PackedLMDataset(store, 16, 4, seed=3)
    for i in range(4):
        np.testing.assert_array_equal(a[i]["tokens"], b[i]["tokens"])


def test_blended_dataset_mix():
    class Const:
        def __init__(self, v):
            self.v = v

        def __len__(self):
            return 100

        def __getitem__(self, i):
            return self.v

    ds = BlendedDataset([Const("a"), Const("b")], [0.75, 0.25], 100)
    vals = [ds[i] for i in range(100)]
    assert 70 <= vals.count("a") <= 80


def test_conversation_templates():
    t = get_template("vicuna_v1")
    t.append_message(t.roles[0], "hello")
    t.append_message(t.roles[1], "hi")
    p = t.get_prompt()
    assert "USER: hello" in p and "ASSISTANT: hi" in p

    t = get_template("llama_3")
    t.append_message("user", "q")
    t.append_message("assistant", None)
    p = t.get_prompt()
    assert p.startswith("<|begin_of_text|>")
    assert p.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")

    t = get_template("llama_2")
    t.append_message(t.roles[0], "q")
    t.append_message(t.roles[1], "a")
    assert "[INST]" in t.get_prompt() and "[/INST] a</s>" in t.get_prompt()


def test_vocab_padding():
    assert vocab_size_with_padding(128256, 1, 128) == 128256
    assert vocab_size_with_padding(128257, 1, 128) == 128384
    assert vocab_size_with_padding(32003, 8, 128) == 32768  # next 1024-multiple


def test_lm_eval_adapter_scores():
    import jax

    from leopard_tpu import config as cfgs
    from leopard_tpu.evaluation.lm_eval_adapter import LeopardLM
    from leopard_tpu.models import vlm
    from tests.test_chat import FakeTokenizer

    cfg = cfgs.tiny_vlm()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    lm = LeopardLM(cfg, params, FakeTokenizer(), max_len=64)
    (ll, greedy), = lm.loglikelihood([("ab", "cd")])
    assert np.isfinite(ll) and ll < 0
    # rolling on a short string
    (roll,) = lm.loglikelihood_rolling([("abcd",)])
    assert np.isfinite(roll)


def test_lm_eval_adapter_overlength_rolling():
    """Regression (round-1 ADVICE): rolling loglikelihood on texts longer than
    max_len must clamp the continuation instead of indexing with negative
    starts — and the score must equal scoring the kept window directly."""
    import jax

    from leopard_tpu import config as cfgs
    from leopard_tpu.evaluation.lm_eval_adapter import LeopardLM
    from leopard_tpu.models import vlm
    from tests.test_chat import FakeTokenizer

    cfg = cfgs.tiny_vlm()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    lm = LeopardLM(cfg, params, FakeTokenizer(), max_len=16)
    text = "abcdefgh" * 8  # 64 tokens under FakeTokenizer ≫ max_len
    (roll,) = lm.loglikelihood_rolling([(text,)])
    assert np.isfinite(roll) and roll < 0
    ids = FakeTokenizer()(text)["input_ids"]
    kept = ids[-16:]
    want, _ = lm._score(kept[:1], kept[1:])
    np.testing.assert_allclose(roll, want, rtol=1e-6)


def test_server_handler_roundtrip():
    import jax

    from leopard_tpu import config as cfgs
    from leopard_tpu.inference.engine import Engine
    from leopard_tpu.inference.server import GenerationServer
    from leopard_tpu.models import vlm

    class MiniTok:
        eos_token_id = 0

        def __call__(self, text, add_special_tokens=True):
            return {"input_ids": [ord(c) % 200 + 1 for c in text]}

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(96 + (i % 26) + 1) for i in ids)

    cfg = cfgs.tiny_vlm()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    engine = Engine(cfg, params, seq_buckets=(16, 32), tile_buckets=(1,))
    server = GenerationServer(engine, MiniTok())
    out = server.handle_generate(
        {"prompts": ["hi"], "max_new_tokens": 3, "greedy": True,
         "eos_token_ids": [999999]}
    )
    assert len(out["text"]) == 1
    assert len(out["tokens"][0]) == 3
    assert len(out["logprobs"][0]) == 3


def test_straggler_toggle_server():
    import socket
    import time as _t

    from leopard_tpu.utils.timers import StepTimeTracker

    tracker = StepTimeTracker(toggle_port=5713)
    _t.sleep(0.3)
    tracker.record(0.1)
    assert tracker.report()

    def send(cmd):
        s = socket.create_connection(("127.0.0.1", 5713), timeout=5)
        s.sendall(cmd.encode())
        out = s.recv(64).decode()
        s.close()
        return out

    assert "off" in send("off")
    tracker.record(0.2)
    assert tracker.report() == {}
    assert "on" in send("on")
    tracker.record(0.3)
    assert tracker.report()["step_time_mean"] > 0
