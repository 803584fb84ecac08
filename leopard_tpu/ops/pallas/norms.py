"""Pallas fused RMSNorm / LayerNorm kernels.

TPU-native replacement for the reference's fused LayerNorm CUDA kernels
(Megatron-LM-MegaBlocks/megatron/fused_kernels/layer_norm_cuda_kernel.cu +
layer_norm_cuda.cpp): one pass over each row block computes the statistics in
fp32 and applies scale/shift without materializing intermediates in HBM.
XLA usually fuses the jnp versions (ops/norms.py) into neighbors; these
kernels exist for the cases where the fusion boundary is wrong (e.g. norm
followed by a collective) and are verified against the jnp versions.

Backward uses custom_vjp recomputation through the jnp reference (cheap:
norms are bandwidth-bound; the recompute fuses into the backward matmuls).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leopard_tpu.ops.norms import layer_norm as layer_norm_ref
from leopard_tpu.ops.norms import rms_norm as rms_norm_ref


def _rms_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    o_ref[:] = (x * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)).astype(
        o_ref.dtype
    )


def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (
        y * w_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    ).astype(o_ref.dtype)


def _row_blocks(n_rows: int, target: int = 256) -> int:
    b = min(target, n_rows)
    while n_rows % b:
        b -= 1
    return b


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5):
    """x: [..., H] → same shape; stats in fp32."""
    shape = x.shape
    h = shape[-1]
    x2 = x.reshape(-1, h)
    rows = x2.shape[0]
    blk = _row_blocks(rows)
    out = pl.pallas_call(
        functools.partial(_rms_kernel, eps=eps),
        grid=(rows // blk,),
        in_specs=[
            pl.BlockSpec((blk, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, h), x.dtype),
    )(x2, weight)
    return out.reshape(shape)


def _rms_fwd(x, weight, eps):
    return fused_rms_norm(x, weight, eps), (x, weight)


def _rms_bwd(eps, res, g):
    x, weight = res
    _, vjp = jax.vjp(lambda x, w: rms_norm_ref(x, w, eps), x, weight)
    return vjp(g)


fused_rms_norm.defvjp(_rms_fwd, _rms_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, weight, bias, eps: float = 1e-6):
    shape = x.shape
    h = shape[-1]
    x2 = x.reshape(-1, h)
    rows = x2.shape[0]
    blk = _row_blocks(rows)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rows // blk,),
        in_specs=[
            pl.BlockSpec((blk, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, h), x.dtype),
    )(x2, weight, bias)
    return out.reshape(shape)


def _ln_fwd(x, weight, bias, eps):
    return fused_layer_norm(x, weight, bias, eps), (x, weight, bias)


def _ln_bwd(eps, res, g):
    x, weight, bias = res
    _, vjp = jax.vjp(lambda x, w, b: layer_norm_ref(x, w, b, eps), x, weight, bias)
    return vjp(g)


fused_layer_norm.defvjp(_ln_fwd, _ln_bwd)
