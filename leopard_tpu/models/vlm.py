"""Leopard VLM: vision tower + pixel-shuffle + projector + decoder with
image-feature splicing.

Behavioral spec: megatron_patch/model/llava/vlm_model.py —
  - encode_images (:468-474): vision tower → pixel_shuffle → mm_projector
  - splice (:526-533): image features replace token embeddings at every
    position where input_ids == IMAGE_TOKEN_INDEX, in order of appearance.

TPU-first splice: instead of boolean scatter (dynamic shapes), positions of
image tokens are resolved with a cumulative count and a static-shape gather —
the i-th image token in the flattened batch takes the i-th image feature row.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from leopard_tpu.config import VLMConfig
from leopard_tpu.models import decoder, projector, siglip
from leopard_tpu.models.decoder import KVCache
from leopard_tpu.ops.pixel_shuffle import pixel_shuffle


def init_params(cfg: VLMConfig, key: jax.Array) -> dict:
    kv, kp, kt = jax.random.split(key, 3)
    params = {
        "vision": siglip.init_params(cfg.vision, kv),
        "projector": projector.init_params(cfg.projector, kp),
        "text": decoder.init_params(cfg.text, kt),
    }
    if cfg.perceiver is not None:
        from leopard_tpu.models import perceiver as perceiver_mod

        params["perceiver"] = perceiver_mod.init_params(
            cfg.perceiver, key, vision_hidden=cfg.vision.hidden_size
        )
    return params


def encode_images(
    params: dict,
    cfg: VLMConfig,
    pixel_values: jnp.ndarray,                 # [N_tiles, 3, H, W]
    patch_mask: Optional[jnp.ndarray] = None,  # [N_tiles, H/p, W/p]
    remat: bool = False,
) -> jnp.ndarray:
    """Returns [N_tiles, tokens_per_tile, text_hidden]."""
    feats = siglip.forward(
        params["vision"], cfg.vision, pixel_values, patch_mask, remat=remat
    )
    if cfg.architecture == "leopard_idefics2":
        from leopard_tpu.models import perceiver as perceiver_mod

        seg = patch_mask.reshape(feats.shape[0], -1).astype(jnp.int32) if patch_mask is not None else None
        return perceiver_mod.forward(params["perceiver"], cfg.perceiver, feats, context_seg=seg)
    if cfg.pixel_shuffle_factor > 1:
        feats = pixel_shuffle(feats, cfg.pixel_shuffle_factor)
    return projector.forward(params["projector"], feats)


def splice_image_features(
    token_embeds: jnp.ndarray,    # [B, S, H]
    image_features: jnp.ndarray,  # [N_tiles, T, H] (order of appearance)
    is_image: jnp.ndarray,        # [B, S] bool
) -> jnp.ndarray:
    """Replace embeddings at image-token positions with image feature rows,
    in flattened-batch order (static shapes; gather instead of scatter)."""
    b, s, h = token_embeds.shape
    flat_embeds = token_embeds.reshape(b * s, h)
    flat_is_img = is_image.reshape(b * s)
    feat_rows = image_features.reshape(-1, h)
    # i-th True position maps to feature row (cumsum-1); clip for False rows.
    row_idx = jnp.clip(jnp.cumsum(flat_is_img) - 1, 0, feat_rows.shape[0] - 1)
    gathered = feat_rows[row_idx]
    out = jnp.where(flat_is_img[:, None], gathered.astype(flat_embeds.dtype), flat_embeds)
    return out.reshape(b, s, h)


def forward(
    params: dict,
    cfg: VLMConfig,
    tokens: jnp.ndarray,                         # [B, S] int32
    images: Optional[jnp.ndarray] = None,        # [N_tiles, 3, H, W]
    patch_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    cache: Optional[KVCache] = None,
    image_features: Optional[jnp.ndarray] = None,  # precomputed encode_images
    remat: bool = False,
    logits_indices: Optional[jnp.ndarray] = None,
    return_aux: bool = False,
    return_hidden: bool = False,
    cp_mesh=None,                                  # Mesh for attn_impl="ring"
    cp_axis: str = "seq",
    fresh_cache: bool = False,   # see decoder.forward — flash-tier prefill
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Full VLM forward → (logits [B, S, V] fp32, updated cache)."""
    embeds = jnp.take(params["text"]["embed_tokens"], jnp.maximum(tokens, 0), axis=0)
    if image_features is None and images is not None:
        image_features = encode_images(params, cfg, images, patch_mask, remat=remat)
    if image_features is not None:
        is_image = tokens == cfg.image_token_id
        embeds = splice_image_features(embeds, image_features, is_image)
    return decoder.forward(
        params["text"],
        cfg.text,
        input_embeds=embeds,
        positions=positions,
        segment_ids=segment_ids,
        cache=cache,
        remat=remat,
        logits_indices=logits_indices,
        return_aux=return_aux,
        return_hidden=return_hidden,
        cp_mesh=cp_mesh,
        cp_axis=cp_axis,
        fresh_cache=fresh_cache,
    )
