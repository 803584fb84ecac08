"""Pixel-shuffle visual-token compression (2×2 space-to-depth).

Behavioral spec: megatron_patch/model/llava/vlm_model.py:456-466 — each tile's
[S, H] token grid (S = side²) is reduced 4× in token count by concatenating
each 2×2 spatial neighborhood along the feature dim. The exact permute order
matters for checkpoint parity; this reproduces the reference's
view/permute/reshape sequence with einops-style reshapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, scale_factor: int = 2) -> jnp.ndarray:
    """x: [batch, seq, dim] with seq a perfect square →
    [batch, seq/scale², dim*scale²]."""
    b, s, d = x.shape
    side = int(round(s**0.5))
    assert side * side == s, f"seq {s} is not a perfect square"
    r = scale_factor
    # [B, H, W, D]
    x = x.reshape(b, side, side, d)
    # view(b, h, w/r, d*r): merge r consecutive W positions into features
    x = x.reshape(b, side, side // r, d * r)
    # permute(0, 2, 1, 3) → [B, W/r, H, D*r]
    x = jnp.transpose(x, (0, 2, 1, 3))
    # reshape → [B, W/r, H/r, D*r²]: merge r consecutive H positions
    x = x.reshape(b, side // r, side // r, d * r * r)
    # permute back → [B, H/r, W/r, D*r²]
    x = jnp.transpose(x, (0, 2, 1, 3))
    return x.reshape(b, s // (r * r), d * r * r)
