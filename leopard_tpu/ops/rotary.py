"""Rotary position embeddings, including Llama-3.1 frequency scaling.

Behavioral spec: the reference's vendored RotaryEmbedding with
rope_type='llama3.1'
(Megatron-LM-240603/megatron/core/models/common/embeddings/rotary_pos_embedding.py:48-119),
which matches HF transformers' llama3 rope scaling. We use the HF
"half-rotation" (non-interleaved) layout so weights converted from HF
checkpoints need no QKV permutation for RoPE.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from leopard_tpu.config import TextConfig


def llama31_scale_inv_freq(
    inv_freq: np.ndarray,
    factor: float = 8.0,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    original_max_position: int = 8192,
) -> np.ndarray:
    """Piecewise NTK-by-parts scaling used by Llama-3.1."""
    low_freq_wavelen = original_max_position / low_freq_factor
    high_freq_wavelen = original_max_position / high_freq_factor
    wavelen = 2.0 * np.pi / inv_freq
    scaled = np.where(wavelen > low_freq_wavelen, inv_freq / factor, inv_freq)
    smooth = (original_max_position / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    smoothed = (1.0 - smooth) * scaled / factor + smooth * scaled
    is_medium = (wavelen <= low_freq_wavelen) & (wavelen >= high_freq_wavelen)
    return np.where(is_medium, smoothed, scaled).astype(np.float32)


def compute_inv_freq(cfg: TextConfig) -> np.ndarray:
    dim = cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim)
    )
    if cfg.rope_scaling == "llama3.1":
        inv_freq = llama31_scale_inv_freq(
            inv_freq,
            factor=cfg.rope_scaling_factor,
            low_freq_factor=cfg.rope_low_freq_factor,
            high_freq_factor=cfg.rope_high_freq_factor,
            original_max_position=cfg.rope_original_max_position,
        )
    elif cfg.rope_scaling == "linear":
        inv_freq = inv_freq / cfg.rope_scaling_factor
    return inv_freq.astype(np.float32)


def rope_cos_sin(positions: jnp.ndarray, inv_freq: jnp.ndarray):
    """cos/sin tables for given integer positions.

    positions: [..., seq] int32 → cos, sin: [..., seq, head_dim] float32,
    built by concatenating the half-dim angle table with itself (HF layout).
    """
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., S, D/2]
    angles = jnp.concatenate([angles, angles], axis=-1)  # [..., S, D]
    return jnp.cos(angles), jnp.sin(angles)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding.

    x: [batch, seq, heads, head_dim]; cos/sin: [batch, seq, head_dim] or
    [seq, head_dim]. Computation in fp32, cast back to x.dtype.
    """
    if cos.ndim == x.ndim - 2:  # [S, D] → broadcast over batch
        cos = cos[None]
        sin = sin[None]
    cos = cos[..., None, :]  # [B, S, 1, D]
    sin = sin[..., None, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + rotate_half(xf) * sin
    return out.astype(x.dtype)
