"""Device-side image preprocessing (resize / normalize / patchify) under jit.

TPU-native replacement for the reference's CVCUDA GPU preprocessing
(megatron_patch/data/llava/cvcuda_image_processing_clip.py:61-233 —
pillowresize, center_crop, convertto, normalize on device). On TPU the same
pipeline is jnp ops inside one jit: XLA fuses resize+normalize and the result
feeds the patchify GEMM directly, so tiles never round-trip to the host.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("size", "method"))
def resize_images(
    images: jnp.ndarray,  # [N, 3, H, W] float in [0,1] or uint8
    size: Tuple[int, int],
    method: str = "bicubic",
) -> jnp.ndarray:
    x = images
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    n, c = x.shape[:2]
    out = jax.image.resize(x, (n, c, size[0], size[1]), method=method)
    return out


@partial(jax.jit, static_argnames=())
def normalize_images(
    images: jnp.ndarray,  # [N, 3, H, W] float in [0,1]
    mean: jnp.ndarray,    # [3]
    std: jnp.ndarray,     # [3]
) -> jnp.ndarray:
    return (images - mean[None, :, None, None]) / std[None, :, None, None]


@partial(jax.jit, static_argnames=("crop",))
def center_crop(images: jnp.ndarray, crop: Tuple[int, int]) -> jnp.ndarray:
    _, _, h, w = images.shape
    top = (h - crop[0]) // 2
    left = (w - crop[1]) // 2
    return jax.lax.dynamic_slice(
        images, (0, 0, top, left),
        (images.shape[0], images.shape[1], crop[0], crop[1]),
    )


@partial(jax.jit, static_argnames=("size", "method"))
def preprocess_on_device(
    images: jnp.ndarray,            # [N, 3, H, W] uint8 or float
    size: Tuple[int, int] = (364, 364),
    mean: Sequence[float] = (0.5, 0.5, 0.5),
    std: Sequence[float] = (0.5, 0.5, 0.5),
    method: str = "bicubic",
) -> jnp.ndarray:
    """uint8 tiles → normalized float tiles, fully on device (fused by XLA)."""
    x = images
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    n, c = x.shape[:2]
    x = jax.image.resize(x, (n, c, size[0], size[1]), method=method)
    x = jnp.clip(x, 0.0, 1.0)
    return normalize_images(x, jnp.asarray(mean, jnp.float32), jnp.asarray(std, jnp.float32))


def normalize_uint8_nhwc(
    images: jnp.ndarray,            # [N, H, W, 3] uint8 (raw PIL layout)
    mean: Sequence[float],
    std: Sequence[float],
) -> jnp.ndarray:
    """Device half of the uint8 preprocessing path (see
    data/anyres.py::preprocess_tiles_uint8): /255 scale, mean/std normalize,
    and the NHWC→NCHW transpose, all inside the caller's jit so XLA fuses
    them into the patchify convolution. NOT jitted standalone — meant to be
    traced inside the encoder program."""
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    x = images.astype(jnp.float32) / 255.0
    x = (x - m[None, None, None, :]) / s[None, None, None, :]
    return x.transpose(0, 3, 1, 2)
