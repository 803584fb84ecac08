"""Normalization layers (jnp reference implementations).

TPU-native equivalent of the reference's fused LayerNorm CUDA kernel
(Megatron-LM-MegaBlocks/megatron/fused_kernels/layer_norm_cuda_kernel.cu) —
on TPU, XLA fuses these elementwise chains into surrounding ops; a Pallas
fused variant lives in leopard_tpu/ops/pallas/norms.py for cases where the
fusion boundary matters (verified against these).

All statistics are computed in float32 regardless of input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    normed = (xf - mean) * (var + eps) ** -0.5
    out = normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)
