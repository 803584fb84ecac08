"""Pallas TPU kernel: activation × int4-packed weight matmul for decode.

Weight-only int4 halves decode's HBM bytes again over int8 (decode reads
every weight once per step — STATUS_R3's roofline table). The catch on TPU:
XLA has no native 4-bit dot, so a pure-JAX unpack (`shift/mask → int8 →
dot`) materializes the unpacked int8 tensor in HBM, reading MORE bytes than
int8 ever did. This kernel unpacks nibbles in VMEM instead: per grid step it
loads a [bk, bn] uint8 block (two nibble planes), selects this K-block's
plane, dequantizes against the per-(group, out-channel) scales IN VMEM, and
feeds one [M, bk]×[bk, bn] dot to the MXU — HBM sees only the packed bytes
and the fp accumulator.

Packing layout (ops/quant.py::quantize_int4): byte row i of `q4` holds
logical weight row i in its LOW nibble and row i + K/2 in its HIGH nibble
("split-half": unpack-concat reproduces logical order with no interleave,
so K-blocks map to contiguous packed rows — Mosaic-friendly, no sublane
shuffles). Values are stored offset-binary (q + 8 ∈ [1, 15], q ∈ [-7, 7]
symmetric around the per-group scale max|w|/7).

r5 retune: the first version used one quant group (128 rows) per K-block
with a per-element `where` selecting the nibble plane — grid-overhead- and
VPU-bound (142 tok/s at 1.5B b1, SLOWER than int8's 400). Now each grid
step consumes BOTH nibble planes of a `block_k`-row packed block (two dots
against the matching x slices — packed bytes read exactly once, no select,
unpack arithmetic in bf16 not int32), with [g, 1, bn]-blocked scales
broadcasting over their groups during the VMEM dequant (measured numbers:
tools/bench_decode.py --quantize int4, CLAUDE.md).

Mosaic tiling note: a scale block of [1, bn] over a [K//128, N] array is
illegal (second-minor block dim must divide 8 or equal the array dim), so
scales are passed as a [K//128, 1, N] view and blocked [g, 1, bn].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(xlo_ref, xhi_ref, p_ref, slo_ref, shi_ref, o_ref):
    jk = pl.program_id(1)
    p = p_ref[...]                                             # uint8 [bk, bn]
    bk, bn = p.shape
    g = slo_ref.shape[0]
    # BOTH nibble planes of the packed block are consumed every step (two
    # dots against the matching x slices) — no per-element select, no
    # double-unpack, and the packed bytes are read exactly once
    p32 = p.astype(jnp.int32)         # Mosaic has no uint8→bf16 cast
    lo = ((p32 & 15) - 8).astype(jnp.bfloat16)
    hi = ((p32 >> 4) - 8).astype(jnp.bfloat16)
    wlo = (lo.reshape(g, bk // g, bn)
           * slo_ref[...].astype(jnp.bfloat16)).reshape(bk, bn)
    whi = (hi.reshape(g, bk // g, bn)
           * shi_ref[...].astype(jnp.bfloat16)).reshape(bk, bn)
    part = jnp.dot(
        xlo_ref[...].astype(jnp.bfloat16), wlo,
        preferred_element_type=jnp.float32,
    ) + jnp.dot(
        xhi_ref[...].astype(jnp.bfloat16), whi,
        preferred_element_type=jnp.float32,
    )                                                          # [M, bn]

    @pl.when(jk == 0)
    def _():
        o_ref[...] = part

    @pl.when(jk > 0)
    def _():
        o_ref[...] += part


@functools.partial(jax.jit, static_argnames=("block_n", "block_k"))
def int4_matmul(x: jnp.ndarray, q4: jnp.ndarray, s: jnp.ndarray,
                block_n: int = 512, block_k: int = 512) -> jnp.ndarray:
    """x [M, K] × packed int4 weight → [M, N] f32.

    q4: [K//2, N] uint8 split-half packed; s: [K//G, N] f32 group scales
    with G == 128. Requires K % 256 == 0 and N % 128 == 0 (lane tiling).
    """
    m, k = x.shape
    n = q4.shape[1]
    groups = s.shape[0]
    assert k // groups == 128 and k % 256 == 0, (k, groups)
    bn = block_n
    while n % bn:
        bn //= 2
    assert bn >= 128, (n, block_n)
    kh = k // 2
    # packed K-block: as large as divides evenly into each nibble half
    bk = min(block_k, kh)
    while kh % bk:
        bk //= 2
    assert bk >= 128 and bk % 128 == 0, (k, block_k)
    nk = kh // bk                     # packed blocks; each covers 2·bk rows
    g = bk // 128
    half_g = kh // 128                # scale-row offset of the high plane

    try:
        from jax.experimental.pallas import tpu as pltpu

        params = dict(compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")))
    except Exception:  # pragma: no cover — non-TPU backends
        params = {}
    s3 = s[:, None, :]
    return pl.pallas_call(
        _kernel,
        grid=(n // bn, nk),
        in_specs=[
            # x slices matching the low (rows [jk·bk, +bk)) and high
            # (same + K/2) nibble planes of packed block jk
            pl.BlockSpec((m, bk), lambda jn, jk: (0, jk)),
            pl.BlockSpec((m, bk), lambda jn, jk, nk=nk: (0, jk + nk)),
            pl.BlockSpec((bk, bn), lambda jn, jk: (jk, jn)),
            pl.BlockSpec((g, 1, bn), lambda jn, jk: (jk, 0, jn)),
            pl.BlockSpec((g, 1, bn),
                         lambda jn, jk, g=g, hg=half_g: (jk + hg // g, 0, jn)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda jn, jk: (0, jn)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        **params,
    )(x, x, q4, s3, s3)
