"""Weight-only int8 quantization for serving.

Beyond-reference feature: decode is HBM-bandwidth-bound (each step reads
every weight once), so storing matmul weights as int8 with per-output-channel
fp scales halves the bytes read per token. The dequant (`int8 → bf16` cast)
fuses into the dot on TPU, so no bf16 copy is materialized.

Quantization is symmetric per output channel:
    w ≈ q · s,  q ∈ int8,  s = max|w_col| / 127  (per column)
and (x @ (q·s)) == (x @ q) · s because s varies only along the output dim.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

QUANT_KEYS = (
    "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "fc1", "fc2", "lm_head",
)


def quantize_int8(w: jnp.ndarray) -> dict:
    """[..., in, out] → {"q": int8 same shape, "s": f32 [..., 1, out]}."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale}


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def matmul(x: jnp.ndarray, w: Any) -> jnp.ndarray:
    """x @ w for plain or quantized weights. The int8→x.dtype convert fuses
    into the dot; the per-channel scale applies to the (small) output."""
    if is_quantized(w):
        y = x @ w["q"].astype(x.dtype)
        return y * w["s"].astype(x.dtype)[..., 0, :]
    return x @ w


def quantize_tree(params: Any, keys: Sequence[str] = QUANT_KEYS) -> Any:
    """Quantize every 2D+ leaf whose key name is in `keys` (weights stay
    layer-stacked; scales get the matching leading dims)."""
    keyset = set(keys)

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k in keyset
                    and hasattr(v, "ndim")
                    and v.ndim >= 2
                    and not is_quantized(v)
                ):
                    out[k] = quantize_int8(v)
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)


def dequantize_tree(params: Any, dtype=jnp.bfloat16) -> Any:
    def walk(node):
        if is_quantized(node):
            return (node["q"].astype(jnp.float32) * node["s"]).astype(dtype)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)
