"""Pallas TPU kernel: activation × int4-packed weight matmul for decode.

Weight-only int4 halves decode's HBM bytes again over int8 (decode reads
every weight once per step — STATUS_R3's roofline table). The catch on TPU:
XLA has no native 4-bit dot, so a pure-JAX unpack (`shift/mask → int8 →
dot`) materializes the unpacked int8 tensor in HBM, reading MORE bytes than
int8 ever did. This kernel unpacks nibbles in VMEM instead: per grid step it
loads a [bk, bn] uint8 block (two nibble planes), selects this K-block's
plane, dequantizes against the per-(group, out-channel) scale, and feeds the
MXU — HBM sees only the packed bytes and the fp accumulator.

Packing layout (ops/quant.py::quantize_int4): byte row i of `q4` holds
logical weight row i in its LOW nibble and row i + K/2 in its HIGH nibble
("split-half": unpack-concat reproduces logical order with no interleave,
so K-blocks map to contiguous packed rows — Mosaic-friendly, no sublane
shuffles). Values are stored offset-binary (q + 8 ∈ [1, 15], q ∈ [-7, 7]
symmetric around the per-group scale max|w|/7).

Scales factor out of the block dot: a K-block IS one quant group, so
acc += (x_blk @ q_blk) · s[group, out] — the dequant multiply runs on the
[M, bn] partial product, not the [bk, bn] weight block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, p_ref, s_ref, o_ref, *, half: int):
    jk = pl.program_id(1)
    p = p_ref[...].astype(jnp.int32)
    nib = jnp.where(jk < half, p & 15, p >> 4)
    w8 = (nib - 8).astype(jnp.bfloat16)                       # [bk, bn]
    part = jnp.dot(
        x_ref[...].astype(jnp.bfloat16), w8,
        preferred_element_type=jnp.float32,
    )                                                          # [M, bn]
    part = part * s_ref[...].astype(jnp.float32)               # s: [1, bn]

    @pl.when(jk == 0)
    def _():
        o_ref[...] = part

    @pl.when(jk > 0)
    def _():
        o_ref[...] += part


@functools.partial(jax.jit, static_argnames=("block_n",))
def int4_matmul(x: jnp.ndarray, q4: jnp.ndarray, s: jnp.ndarray,
                block_n: int = 512) -> jnp.ndarray:
    """x [M, K] × packed int4 weight → [M, N] f32.

    q4: [K//2, N] uint8 split-half packed; s: [K//G, N] f32 group scales
    with G == 128 (one K-block per group). Requires K % 256 == 0 and
    N % 128 == 0 (lane tiling).
    """
    m, k = x.shape
    n = q4.shape[1]
    groups = s.shape[0]
    bk = k // groups
    assert bk == 128 and k % (2 * bk) == 0, (k, groups)
    bn = block_n
    while n % bn:
        bn //= 2
    assert bn >= 128, (n, block_n)
    nk = k // bk
    half = nk // 2

    return pl.pallas_call(
        functools.partial(_kernel, half=half),
        grid=(n // bn, nk),
        in_specs=[
            pl.BlockSpec((m, bk), lambda jn, jk: (0, jk)),
            # both nibble planes of this K-block live in the same packed
            # rows; jk and jk+half map to the same block, different nibble
            pl.BlockSpec((bk, bn), lambda jn, jk: (jk % half, jn)),
            pl.BlockSpec((1, bn), lambda jn, jk: (jk, jn)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda jn, jk: (0, jn)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(x, q4, s)
