"""Multimodal MLP projector (vision features → LLM embedding space).

Behavioral spec: mm_projector_builder.py:72-110 (`mlp2x_gelu`): Linear(in→h)
→ GELU (exact) → Linear(h→h), with bias. Input dim is vision hidden ×4
because pixel-shuffle concatenates 2×2 neighborhoods.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from leopard_tpu.config import ProjectorConfig


def init_params(cfg: ProjectorConfig, key: jax.Array) -> dict:
    k1, k2 = jax.random.split(key)
    dt = jnp.dtype(cfg.dtype)

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) * fan_in**-0.5).astype(dt)

    return {
        "fc1": dense(k1, (cfg.input_size, cfg.hidden_size), cfg.input_size),
        "b1": jnp.zeros((cfg.hidden_size,), dt),
        "fc2": dense(k2, (cfg.hidden_size, cfg.hidden_size), cfg.hidden_size),
        "b2": jnp.zeros((cfg.hidden_size,), dt),
    }


def forward(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ params["fc1"] + params["b1"]
    y = jax.nn.gelu(y, approximate=False)
    return y @ params["fc2"] + params["b2"]
