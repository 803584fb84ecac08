"""Weight-only int8 / int4 quantization for serving.

Beyond-reference feature: decode is HBM-bandwidth-bound (each step reads
every weight once), so storing matmul weights in fewer bits cuts the bytes
read per token — int8 halves them, int4 halves them again.

int8 is symmetric per output channel:
    w ≈ q · s,  q ∈ int8,  s = max|w_col| / 127  (per column)
and (x @ (q·s)) == (x @ q) · s because s varies only along the output dim.
The int8 → bf16 cast fuses into the dot on TPU; no bf16 copy materializes.

int4 needs finer scales to stay accurate: symmetric per (input-group,
output-channel), group = 128 along the reduction dim, q ∈ [-7, 7] stored
offset-binary in packed nibbles (two logical rows per byte, "split-half"
layout — byte row i holds row i low / row i+K/2 high, so unpack-concat is
already logical order). Because group scales vary along the REDUCTION dim
they cannot factor out of one big dot; a pure-JAX unpack would materialize
the int8 tensor in HBM (worse than int8). On TPU the matmul therefore runs
through a Pallas kernel that unpacks in VMEM (ops/pallas/int4_matmul.py);
off-TPU (and for compute-bound prefill shapes) a grouped-einsum reference
path is used.
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


INT4_GROUP = 128


def quantize_int4(w: jnp.ndarray, group: int = INT4_GROUP) -> dict:
    """[..., K, N] → {"q4": uint8 [..., K//2, N] split-half nibble-packed,
    "s": f32 [..., K//group, N] per-(group, out-channel) scales}.
    Requires K % (2·group) == 0 (true for every decoder matmul: hidden and
    MLP widths are multiples of 256)."""
    *lead, k, n = w.shape
    assert k % (2 * group) == 0, (k, group)
    wf = w.astype(jnp.float32).reshape(*lead, k // group, group, n)
    s = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 7.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(wf / s), -7, 7) + 8.0               # [1, 15]
    q = q.astype(jnp.uint8).reshape(*lead, k, n)
    lo, hi = q[..., : k // 2, :], q[..., k // 2 :, :]
    return {"q4": lo | (hi << 4), "s": s.reshape(*lead, k // group, n)}


def _unpack_int4(w: dict) -> jnp.ndarray:
    """Packed int4 dict → f32 [..., K, N] dequantized weights (reference
    path; materializes the full tensor — test/CPU/prefill use only)."""
    q4, s = w["q4"], w["s"]
    *lead, kh, n = q4.shape
    k = 2 * kh
    group = k // s.shape[-2]
    lo = (q4 & 15).astype(jnp.int32)
    hi = (q4 >> 4).astype(jnp.int32)
    q = jnp.concatenate([lo, hi], axis=-2) - 8                 # [..., K, N]
    wf = q.reshape(*lead, k // group, group, n).astype(jnp.float32)
    wf = wf * s[..., :, None, :]
    return wf.reshape(*lead, k, n)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and ("q" in w or "q4" in w) and "s" in w


def matmul(x: jnp.ndarray, w: Any) -> jnp.ndarray:
    """x @ w for plain or quantized weights. int8: the int8→x.dtype convert
    fuses into the dot and the per-channel scale applies to the (small)
    output. int4: Pallas VMEM-unpack kernel on TPU for bandwidth-bound
    (small-M) shapes; grouped dequant reference path elsewhere."""
    if isinstance(w, dict) and "q4" in w:
        *lead, k = x.shape
        m = 1
        for d in lead:
            m *= d
        on_tpu = jax.devices()[0].platform == "tpu"
        kernel_group = (
            w["q4"].ndim == 2
            and 2 * w["q4"].shape[0] // w["s"].shape[0] == 128
        )
        if on_tpu and m <= 64 and x.ndim <= 3 and kernel_group:
            from leopard_tpu.ops.pallas.int4_matmul import int4_matmul

            y = int4_matmul(x.reshape(m, k), w["q4"], w["s"])
            return y.astype(x.dtype).reshape(*lead, -1)
        # Dense-dequant path (CPU, and TPU shapes the kernel doesn't take:
        # m > 64 — compute-bound prefill — or non-128 groups): unpack the
        # nibbles to int8, scale in x.dtype, and run ONE plain dot. The
        # transient dequantized [K, N] bf16 block is ≤117 MB at the 8B
        # profile and amortizes over ≥64 rows. (r5: the previous
        # grouped-einsum variant avoided this temp but produced a
        # [M, K//G, N] f32 partial-sum tensor — 7.5 GB/layer at the 8B
        # batch-8 context prefill, a compile-time OOM on TPU.)
        q4, s = w["q4"], w["s"]
        if q4.ndim == 2:
            kh, n = q4.shape
            kk = 2 * kh
            group = kk // s.shape[0]
            lo = (q4 & 15).astype(jnp.int8)
            hi = (q4 >> 4).astype(jnp.int8)
            q = jnp.concatenate([lo, hi], axis=0) - jnp.int8(8)  # [K, N] int8
            wf = (
                q.reshape(kk // group, group, n).astype(x.dtype)
                * s.astype(x.dtype)[:, None, :]
            ).reshape(kk, n)
            return x @ wf
        return (x @ _unpack_int4(w).astype(x.dtype))
    if is_quantized(w):
        y = x @ w["q"].astype(x.dtype)
        return y * w["s"].astype(x.dtype)[..., 0, :]
    return x @ w


def quantize_tree(params: Any, keys: Sequence[str] = QUANT_KEYS,
                  mode: str = "int8") -> Any:
    """Quantize every 2D+ leaf whose key name is in `keys` (weights stay
    layer-stacked; scales get the matching leading dims)."""
    keyset = set(keys)
    assert mode in ("int8", "int4"), mode
    quantize = quantize_int8 if mode == "int8" else quantize_int4

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
                    if mode == "int4":
                        # shrink the group until it divides the (packed)
                        # reduction dim; odd widths fall back to int8. The
                        # Pallas kernel only takes group==128 (the flagship
                        # widths); smaller groups use the reference path.
                        g = INT4_GROUP
                        while g >= 16 and v.shape[-2] % (2 * g):
                            g //= 2
                        out[k] = (
                            quantize_int4(v, group=g) if g >= 16
                            else quantize_int8(v)
                        )
                    else:
                        out[k] = quantize(v)
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)


def dequantize_tree(params: Any, dtype=jnp.bfloat16) -> Any:
    def walk(node):
        if is_quantized(node):
            if "q4" in node:
                return _unpack_int4(node).astype(dtype)
            return (node["q"].astype(jnp.float32) * node["s"]).astype(dtype)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)
