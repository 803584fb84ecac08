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
    pixel_values: jnp.ndarray,                 # [N_tiles, 3, H, W] float —
                                               # or [N_tiles, H, W, 3] uint8
    patch_mask: Optional[jnp.ndarray] = None,  # [N_tiles, H/p, W/p]
    remat: bool = False,
) -> jnp.ndarray:
    """Returns [N_tiles, tokens_per_tile, text_hidden].

    uint8 NHWC input takes the device-side preprocessing path: /255 +
    mean/std normalize + NCHW transpose run here, inside the caller's jit
    (≙ the reference's CVCUDA GPU preprocessing; 4× less host transfer)."""
    if pixel_values.dtype == jnp.uint8:
        from leopard_tpu.ops.image import normalize_uint8_nhwc

        pixel_values = normalize_uint8_nhwc(
            pixel_values, cfg.anyres.image_mean, cfg.anyres.image_std
        )
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
    row_offsets: Optional[jnp.ndarray] = None,  # [B] int32
) -> jnp.ndarray:
    """Replace embeddings at image-token positions with image feature rows,
    in flattened-batch order (static shapes; gather instead of scatter).

    `row_offsets` supports CHUNKED prefill: when the tokens are one chunk of
    a longer prompt, offsets[r] = feature rows already consumed by row r's
    earlier chunks plus all rows before r (the flat order of the full
    prompt); the i-th image token of row r in this chunk then takes feature
    row offsets[r] + i."""
    b, s, h = token_embeds.shape
    feat_rows = image_features.reshape(-1, h)
    if row_offsets is None:
        flat_is_img = is_image.reshape(b * s)
        row_idx = jnp.cumsum(flat_is_img) - 1
    else:
        per_row = jnp.cumsum(is_image, axis=1) - 1          # [B, S]
        row_idx = (row_offsets[:, None] + per_row).reshape(b * s)
    row_idx = jnp.clip(row_idx, 0, feat_rows.shape[0] - 1)
    gathered = feat_rows[row_idx]
    flat_embeds = token_embeds.reshape(b * s, h)
    flat_is_img = is_image.reshape(b * s)
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
    remat_vision=None,       # vision-tower override; None = same as remat
    logits_indices: Optional[jnp.ndarray] = None,
    return_aux: bool = False,
    return_hidden: bool = False,
    cp_mesh=None,                                  # Mesh for attn_impl="ring"
    cp_axis: str = "seq",
    fresh_cache: bool = False,   # see decoder.forward — flash-tier prefill
    feature_row_offsets: Optional[jnp.ndarray] = None,  # [B] chunked prefill
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Full VLM forward → (logits [B, S, V] fp32, updated cache)."""
    from leopard_tpu.parallel.sharding import maybe_constrain

    embeds = jnp.take(params["text"]["embed_tokens"], jnp.maximum(tokens, 0), axis=0)
    # pin the gather output to the activation layout. The embed table keeps
    # H unsharded (vocab over model×fsdp, parallel/sharding.py) precisely so
    # this is a cheap slice of a replicated-H tensor; H-fsdp or unpinned
    # layouts here made the SPMD partitioner replicate the [B,S,H] gather
    # output then repartition ("Involuntary full rematerialization", dryrun
    # phase-1 warning) — ~1 GB/device at the 8B profile.
    embeds = maybe_constrain(embeds, ("data", "fsdp"), "seq", None)
    if image_features is None and images is not None:
        image_features = encode_images(
            params, cfg, images, patch_mask,
            remat=remat if remat_vision is None else remat_vision,
        )
    if image_features is not None:
        # image features are consumed by a flat gather over all rows — they
        # must be replicated across the token shards; saying so explicitly
        # keeps the reshard an all-gather of O(N_tiles·T·H) (48·169·4096·2B
        # = 66 MB at the 8B eval shape) instead of an involuntary
        # replicate-repartition of the [B,S,H] splice output
        image_features = maybe_constrain(
            image_features, None, None, None, allow_replicated=True
        )
        is_image = tokens == cfg.image_token_id
        embeds = splice_image_features(embeds, image_features, is_image,
                                       row_offsets=feature_row_offsets)
        embeds = maybe_constrain(embeds, ("data", "fsdp"), "seq", None)
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
