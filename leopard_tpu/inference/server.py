"""Minimal text/multimodal generation HTTP server.

Role parity with the reference's inference server
(megatron/inference/text_generation_server.py, driven through
megatron_patch/generation/api.py): a JSON API over the engine.

  POST /api/generate
    {"prompts": ["..."], "max_new_tokens": 64, "temperature": 1.0,
     "top_k": 0, "top_p": 0.0, "greedy": true}
  → {"text": [...], "logprobs": [[...]], "tokens": [[...]]}

  GET /health → {"status": "ok"}

Single-threaded by design: one TPU program runs at a time; requests queue in
the socket backlog (the reference serializes through a lock the same way).
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

from leopard_tpu.config import GenerateConfig
from leopard_tpu.inference.engine import Engine


class GenerationServer:
    def __init__(self, engine: Engine, tokenizer, host: str = "0.0.0.0",
                 port: int = 5000):
        self.engine = engine
        self.tokenizer = tokenizer
        self.host = host
        self.port = port

    def handle_generate(self, payload: dict) -> dict:
        prompts = payload["prompts"]
        gen = GenerateConfig(
            max_new_tokens=int(payload.get("max_new_tokens", 128)),
            temperature=float(payload.get("temperature", 1.0)),
            top_k=int(payload.get("top_k", 0)),
            top_p=float(payload.get("top_p", 0.0)),
            repetition_penalty=float(payload.get("repetition_penalty", 1.0)),
            greedy=bool(payload.get("greedy", True)),
            eos_token_ids=tuple(payload.get("eos_token_ids", (128001, 128009))),
            seed=int(payload.get("seed", 0)),
        )
        ids = [
            np.asarray(self.tokenizer(p, add_special_tokens=True)["input_ids"],
                       np.int32)
            for p in prompts
        ]
        res = self.engine.generate(ids, gen_cfg=gen)
        return {
            "text": [
                self.tokenizer.decode(t.tolist(), skip_special_tokens=True)
                for t in res.tokens
            ],
            "tokens": [t.tolist() for t in res.tokens],
            "logprobs": [l.tolist() for l in (res.logprobs or [])],
        }

    def serve_forever(self):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code: int, obj: dict):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":
                    self._reply(200, {"status": "ok"})
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/api/generate":
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(length))
                    self._reply(200, outer.handle_generate(payload))
                except Exception as e:  # noqa: BLE001 — report to client
                    self._reply(500, {"error": str(e)})

        server = HTTPServer((self.host, self.port), Handler)
        print(f"leopard-tpu generation server on {self.host}:{self.port}")
        server.serve_forever()
