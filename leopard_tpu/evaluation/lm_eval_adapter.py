"""lm-evaluation-harness adaptor.

Role parity with megatron_patch/lm_evaluate.py:41 (EvalHarnessAdaptor(HFLM)):
exposes the engine through the LM interface lm-eval expects —
`loglikelihood(context, continuation)`, `loglikelihood_rolling`, and
`generate_until`. The lm-eval package itself is optional; the adaptor's core
scoring methods are dependency-free and unit-tested directly.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from leopard_tpu.config import GenerateConfig, VLMConfig
from leopard_tpu.models import decoder


class LeopardLM:
    def __init__(self, cfg: VLMConfig, params, tokenizer, max_len: int = 4096):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.max_len = max_len

        @jax.jit
        def _logprobs(text_params, tokens, seg):
            logits, _ = decoder.forward(
                text_params, cfg.text, tokens, segment_ids=seg
            )
            return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        self._logprobs = _logprobs

    def _score(self, ctx_ids: Sequence[int], cont_ids: Sequence[int]) -> Tuple[float, bool]:
        """Sum logprob of continuation given context + greedy-match flag.

        Over-length requests keep the last max_len tokens; the continuation is
        clamped so at least one conditioning token remains (scoring position
        t reads lp[t-1], so start must be >= 1)."""
        ids = list(ctx_ids) + list(cont_ids)
        ids = ids[-self.max_len:]
        n_cont = min(len(cont_ids), len(ids) - 1)
        if n_cont <= 0:
            return 0.0, True
        pad = 8 * ((len(ids) + 7) // 8)
        tokens = np.zeros((1, pad), np.int32)
        seg = np.zeros((1, pad), np.int32)
        tokens[0, : len(ids)] = ids
        seg[0, : len(ids)] = 1
        lp = np.asarray(self._logprobs(
            self.params["text"], jnp.asarray(tokens), jnp.asarray(seg)
        ))[0]
        total, greedy = 0.0, True
        start = len(ids) - n_cont
        for t in range(start, len(ids)):
            total += float(lp[t - 1, ids[t]])
            if int(np.argmax(lp[t - 1])) != ids[t]:
                greedy = False
        return total, greedy

    # --- lm-eval LM interface -------------------------------------------

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        out = []
        for req in requests:
            ctx, cont = req.args if hasattr(req, "args") else req
            ctx_ids = self.tokenizer(ctx, add_special_tokens=True)["input_ids"]
            cont_ids = self.tokenizer(cont, add_special_tokens=False)["input_ids"]
            out.append(self._score(ctx_ids, cont_ids))
        return out

    def loglikelihood_rolling(self, requests) -> List[float]:
        out = []
        for req in requests:
            if hasattr(req, "args"):
                (text,) = req.args
            elif isinstance(req, tuple):
                (text,) = req
            else:
                text = req
            ids = self.tokenizer(text, add_special_tokens=True)["input_ids"]
            total, _ = self._score(ids[:1], ids[1:])
            out.append(total)
        return out

    def generate_until(self, requests) -> List[str]:
        from leopard_tpu.inference.engine import Engine

        engine = Engine(self.cfg, self.params)
        out = []
        for req in requests:
            ctx, kwargs = req.args if hasattr(req, "args") else req
            ids = np.asarray(
                self.tokenizer(ctx, add_special_tokens=True)["input_ids"], np.int32
            )
            gen = GenerateConfig(
                max_new_tokens=kwargs.get("max_gen_toks", 128),
                greedy=True,
                eos_token_ids=tuple(
                    self.tokenizer(u, add_special_tokens=False)["input_ids"][-1]
                    for u in kwargs.get("until", [])
                ) or (self.tokenizer.eos_token_id,),
            )
            res = engine.generate([ids], gen_cfg=gen)
            out.append(self.tokenizer.decode(res.tokens[0].tolist(),
                                             skip_special_tokens=True))
        return out
