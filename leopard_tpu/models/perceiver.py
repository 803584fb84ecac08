"""Idefics2 connector: SwiGLU modality projection + perceiver resampler.

Behavioral spec: the reference's TP-parallel perceiver
(megatron_patch/model/idefics2/perceiver_transformer.py — learned latents,
cross-attn latents ← [context; latents], RMSNorm, SwiGLU per
Idefics2PerceiverConfig) whose numerics match HF Idefics2Connector /
Idefics2PerceiverResampler (the parity oracle used by our tests):

  - modality projection: SwiGLU MLP vision_hidden → text_intermediate →
    text_hidden
  - resampler: `depth` layers; per layer RMSNorm(latents), RMSNorm(context),
    GQA cross-attention with keys/values over concat([context, latents]),
    residual, RMSNorm, MLP(hidden → 4·hidden SwiGLU), residual; final RMSNorm
  - context attention mask: invalid (padded) context positions are never
    attended; latents always attend to each other.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from leopard_tpu.config import PerceiverConfig
from leopard_tpu.ops.attention import attention
from leopard_tpu.ops.norms import rms_norm


def init_params(cfg: PerceiverConfig, key: jax.Array, vision_hidden: int = 1152) -> dict:
    k = iter(jax.random.split(key, 12))
    h = cfg.hidden_size
    L = cfg.num_layers
    qd = cfg.num_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim
    mlp_h = h * 4
    dt = jnp.dtype(cfg.dtype)

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) * fan_in**-0.5).astype(dt)

    return {
        "modality_proj": {
            "w_gate": dense(next(k), (vision_hidden, cfg.intermediate_size), vision_hidden),
            "w_up": dense(next(k), (vision_hidden, cfg.intermediate_size), vision_hidden),
            "w_down": dense(next(k), (cfg.intermediate_size, h), cfg.intermediate_size),
        },
        "latents": jnp.ones((cfg.num_latents, h), dt),
        "layers": {
            "latents_norm": jnp.ones((L, h), dt),
            "context_norm": jnp.ones((L, h), dt),
            "attn": {
                "wq": dense(next(k), (L, h, qd), h),
                "wk": dense(next(k), (L, h, kvd), h),
                "wv": dense(next(k), (L, h, kvd), h),
                "wo": dense(next(k), (L, qd, h), qd),
            },
            "post_attn_norm": jnp.ones((L, h), dt),
            "mlp": {
                "w_gate": dense(next(k), (L, h, mlp_h), h),
                "w_up": dense(next(k), (L, h, mlp_h), h),
                "w_down": dense(next(k), (L, mlp_h, h), mlp_h),
            },
        },
        "final_norm": jnp.ones((h,), dt),
    }


def modality_projection(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    p = params["modality_proj"]
    return (jax.nn.silu(x @ p["w_gate"]) * (x @ p["w_up"])) @ p["w_down"]


def forward(
    params: dict,
    cfg: PerceiverConfig,
    vision_features: jnp.ndarray,           # [B, S, vision_hidden]
    context_seg: Optional[jnp.ndarray] = None,  # [B, S] int; 0 = padded patch
) -> jnp.ndarray:
    """Returns [B, num_latents, hidden] compressed image tokens."""
    context = modality_projection(params, vision_features.astype(jnp.dtype(cfg.dtype)))
    b, s, h = context.shape
    n = cfg.num_latents
    latents0 = jnp.broadcast_to(params["latents"][None], (b, n, h))

    if context_seg is None:
        context_seg = jnp.ones((b, s), jnp.int32)
    # kv = [context; latents]: context positions keep validity, latents valid
    kv_valid = jnp.concatenate(
        [context_seg != 0, jnp.ones((b, n), bool)], axis=1
    )  # [B, S+n]
    mask = kv_valid[:, None, None, :]  # queries (latents) attend anything valid

    def body(carry, lp):
        (lat,) = carry
        res = lat
        lat_n = rms_norm(lat, lp["latents_norm"], cfg.rms_norm_eps)
        ctx_n = rms_norm(context, lp["context_norm"], cfg.rms_norm_eps)
        kv_in = jnp.concatenate([ctx_n, lat_n], axis=1)  # [B, S+n, H]
        q = (lat_n @ lp["attn"]["wq"]).reshape(b, n, cfg.num_heads, cfg.head_dim)
        kk = (kv_in @ lp["attn"]["wk"]).reshape(b, s + n, cfg.num_kv_heads, cfg.head_dim)
        vv = (kv_in @ lp["attn"]["wv"]).reshape(b, s + n, cfg.num_kv_heads, cfg.head_dim)
        o = attention(q, kk, vv, mask=mask)
        lat = res + o.reshape(b, n, -1) @ lp["attn"]["wo"]
        res = lat
        y = rms_norm(lat, lp["post_attn_norm"], cfg.rms_norm_eps)
        y = jax.nn.silu(y @ lp["mlp"]["w_gate"]) * (y @ lp["mlp"]["w_up"])
        lat = res + y @ lp["mlp"]["w_down"]
        return (lat,), None

    (latents,), _ = jax.lax.scan(body, (latents0,), params["layers"])
    return rms_norm(latents, params["final_norm"], cfg.rms_norm_eps)
