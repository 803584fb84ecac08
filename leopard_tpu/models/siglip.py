"""SigLIP-SO400M / Idefics2-NaViT vision transformer encoder.

Behavioral spec: the reference's shared ViT tower
(megatron_patch/model/idefics2/idefics_vision_tower.py:17-180) configured from
HF SiglipConfig (megatron_patch/model/llava/clip_encoder.py:318-342):
27 pre-LN layers, GELU-tanh MLP, qkv bias, LayerNorm, post-LN at the output,
and NaViT-style aspect-ratio-preserving bucketized 2-D position ids computed
from the per-image patch validity mask (idefics_vision_tower.py:129-150).

Functional pytree params, layer-stacked + lax.scan like the decoder. The
patchify conv is expressed as an unfold-matmul so it lowers onto the MXU as a
single large GEMM over all tiles (the per-tile grid is static: 26×26 at 364px).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from leopard_tpu.config import VisionConfig
from leopard_tpu.ops.attention import attention
from leopard_tpu.ops.norms import layer_norm
from leopard_tpu.ops.remat import remat_wrap, tag_attn_out


def _dtype(cfg: VisionConfig):
    return jnp.dtype(cfg.dtype)


def init_params(cfg: VisionConfig, key: jax.Array) -> dict:
    k = iter(jax.random.split(key, 24))
    h, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    p = cfg.patch_size
    dt = _dtype(cfg)

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) * fan_in**-0.5).astype(dt)

    n_pos = cfg.patches_per_side**2 + (1 if cfg.use_class_token else 0)
    params_extra = {}
    if cfg.use_class_token:
        params_extra["class_embed"] = dense(next(k), (h,), h)
    if cfg.pre_ln:
        params_extra["pre_ln"] = {"scale": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)}
    return {
        # [patch_size*patch_size*3, hidden]: unfolded patch → embedding GEMM
        "patch_embed": {
            "kernel": dense(next(k), (p * p * cfg.num_channels, h), p * p * 3),
            **({"bias": jnp.zeros((h,), dt)} if cfg.patch_bias else {}),
        },
        "pos_embed": dense(next(k), (n_pos, h), h),
        **params_extra,
        "layers": {
            "ln1": {"scale": jnp.ones((L, h), dt), "bias": jnp.zeros((L, h), dt)},
            "attn": {
                "wq": dense(next(k), (L, h, h), h),
                "bq": jnp.zeros((L, h), dt),
                "wk": dense(next(k), (L, h, h), h),
                "bk": jnp.zeros((L, h), dt),
                "wv": dense(next(k), (L, h, h), h),
                "bv": jnp.zeros((L, h), dt),
                "wo": dense(next(k), (L, h, h), h),
                "bo": jnp.zeros((L, h), dt),
            },
            "ln2": {"scale": jnp.ones((L, h), dt), "bias": jnp.zeros((L, h), dt)},
            "mlp": {
                "fc1": dense(next(k), (L, h, f), h),
                "b1": jnp.zeros((L, f), dt),
                "fc2": dense(next(k), (L, f, h), f),
                "b2": jnp.zeros((L, h), dt),
            },
        },
        "post_ln": {"scale": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
    }


def patchify(pixel_values: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, 3, H, W] → [B, (H/p)*(W/p), p*p*3] row-major patches.

    Unfold layout matches a Conv2d(kernel=p, stride=p) when the conv weight
    [out, in, kh, kw] is flattened as in-major: feature index = (c*p + kh)*p + kw.
    """
    b, c, hh, ww = pixel_values.shape
    p = patch_size
    x = pixel_values.reshape(b, c, hh // p, p, ww // p, p)
    # → [B, H/p, W/p, C, p, p]
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (hh // p) * (ww // p), c * p * p)


def navit_position_ids(
    patch_mask: jnp.ndarray,  # [B, nph, npw] bool — True = real patch
    patches_per_side: int,
) -> jnp.ndarray:
    """Bucketized 2-D position ids (idefics_vision_tower.py:129-150).

    Each image's real patch grid (top-left rectangle of the mask) is mapped
    onto the full patches_per_side² learned position table by fractional
    coordinate bucketing, preserving aspect ratio. Invalid patches get id 0
    (they are masked out of attention anyway).
    """
    b, nph, npw = patch_mask.shape
    n = patches_per_side
    boundaries = jnp.arange(1, n, dtype=jnp.float32) / n  # 1/n .. (n-1)/n
    nb_h = jnp.sum(patch_mask[:, :, 0].astype(jnp.int32), axis=1)  # [B]
    nb_w = jnp.sum(patch_mask[:, 0, :].astype(jnp.int32), axis=1)  # [B]
    rows = jnp.arange(nph, dtype=jnp.float32)[None, :]  # [1, nph]
    cols = jnp.arange(npw, dtype=jnp.float32)[None, :]
    frac_h = rows / jnp.maximum(nb_h, 1)[:, None]
    frac_w = cols / jnp.maximum(nb_w, 1)[:, None]
    bucket_h = jnp.searchsorted(boundaries, frac_h, side="right").astype(jnp.int32)
    bucket_w = jnp.searchsorted(boundaries, frac_w, side="right").astype(jnp.int32)
    ids = bucket_h[:, :, None] * n + bucket_w[:, None, :]  # [B, nph, npw]
    ids = jnp.where(patch_mask, ids, 0)
    return ids.reshape(b, nph * npw)


def forward(
    params: dict,
    cfg: VisionConfig,
    pixel_values: jnp.ndarray,                      # [B, 3, H, W]
    patch_mask: Optional[jnp.ndarray] = None,       # [B, H/p, W/p] bool
    remat: bool = False,
) -> jnp.ndarray:
    """Returns [B, num_patches, hidden] post-LN features. remat=True
    rematerializes each tower layer in the backward (the tower's per-layer
    [tiles, patches, intermediate] activations otherwise dominate training
    HBM at high tile counts — ≙ full recompute, which the reference applies
    to the whole network incl. the tower via --recompute-granularity full)."""
    b = pixel_values.shape[0]
    p = cfg.patch_size
    nph, npw = pixel_values.shape[2] // p, pixel_values.shape[3] // p

    x = patchify(pixel_values.astype(_dtype(cfg)), p)
    x = x @ params["patch_embed"]["kernel"]
    if "bias" in params["patch_embed"]:
        x = x + params["patch_embed"]["bias"]

    cls_offset = 1 if cfg.use_class_token else 0
    if patch_mask is not None:
        pos_ids = navit_position_ids(patch_mask, cfg.patches_per_side) + cls_offset
        seg = patch_mask.reshape(b, -1).astype(jnp.int32)
    else:
        pos_ids = jnp.broadcast_to(
            jnp.arange(cls_offset, nph * npw + cls_offset, dtype=jnp.int32),
            (b, nph * npw),
        )
        seg = None
    x = x + jnp.take(params["pos_embed"], pos_ids, axis=0)
    if cfg.use_class_token:
        cls = params["class_embed"][None, None, :] + params["pos_embed"][0]
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, x.shape[-1])).astype(x.dtype), x], axis=1)
        if seg is not None:
            seg = jnp.concatenate([jnp.ones((b, 1), jnp.int32), seg], axis=1)
    if cfg.pre_ln:
        x = layer_norm(
            x, params["pre_ln"]["scale"], params["pre_ln"]["bias"], cfg.layer_norm_eps
        )

    # flash attention needs the sequence padded to a ×128 block multiple; the
    # pad positions carry segment id 0 so they never contribute (+14% encoder
    # throughput on v5e vs dense at 676 patches)
    impl = cfg.attn_impl
    if impl == "auto":
        impl = "flash" if jax.devices()[0].platform == "tpu" else "dense"
    s_real = x.shape[1]
    flash_block_q = flash_block_k = 0
    if impl == "flash":
        # long sequences (NaViT-980: 4900 patches) pad to a ×512 multiple so
        # the kernel gets full 512 blocks — ×128 padding gave 4992 → block
        # 384 and a ragged grid
        mult = 512 if s_real >= 2048 else 128
        s_pad = ((s_real + mult - 1) // mult) * mult
        if seg is None:
            seg = jnp.ones((b, s_real), jnp.int32)
        if s_pad != s_real:
            x = jnp.pad(x, ((0, 0), (0, s_pad - s_real), (0, 0)))
            seg = jnp.pad(seg, ((0, 0), (0, s_pad - s_real)))
        flash_block_q = next(
            d * 128 for d in range(min(4, s_pad // 128), 0, -1)
            if s_pad % (d * 128) == 0
        )
        # short non-causal sequences (SigLIP-364: 676→768): take ALL of kv in
        # one block — the online-softmax rescale collapses to a single plain
        # softmax pass (scores block BQ×S_pad fp32 ≤ 1.5 MB VMEM)
        flash_block_k = s_pad if s_pad <= 1024 else flash_block_q
        if s_pad <= 1024:
            flash_block_q = s_pad

    def body(carry, lp):
        (h,) = carry
        res = h
        y = layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"], cfg.layer_norm_eps)
        s = y.shape[1]
        q = (y @ lp["attn"]["wq"] + lp["attn"]["bq"]).reshape(b, s, cfg.num_heads, cfg.head_dim)
        kk = (y @ lp["attn"]["wk"] + lp["attn"]["bk"]).reshape(b, s, cfg.num_heads, cfg.head_dim)
        vv = (y @ lp["attn"]["wv"] + lp["attn"]["bv"]).reshape(b, s, cfg.num_heads, cfg.head_dim)
        if impl == "flash":
            from leopard_tpu.ops.pallas.flash_attention import flash_attention

            # seg here is a 0/1 validity mask (pad + NaViT patch mask), not
            # multi-segment packing → kv-only masking; invalid q rows are
            # don't-care (LLaVA: sliced off; NaViT: masked downstream)
            o = flash_attention(
                q, kk, vv, causal=False,
                q_segment_ids=seg, kv_segment_ids=seg,
                block_q=flash_block_q, block_k=flash_block_k,
                kv_only_mask=True,
            )
        else:
            o = attention(q, kk, vv, q_segment_ids=seg, kv_segment_ids=seg)
            # flash tags its own output inside the custom_vjp forward rule
            # (see flash_attention._flash_fwd); tagging again here would save
            # the same buffer twice under the attn/selective policies
            o = tag_attn_out(o)
        h = res + (o.reshape(b, s, -1) @ lp["attn"]["wo"] + lp["attn"]["bo"])
        res = h
        y = layer_norm(h, lp["ln2"]["scale"], lp["ln2"]["bias"], cfg.layer_norm_eps)
        y = y @ lp["mlp"]["fc1"] + lp["mlp"]["b1"]
        if cfg.hidden_act == "quick_gelu":
            y = y * jax.nn.sigmoid(1.702 * y)
        else:
            y = jax.nn.gelu(y, approximate=True)
        h = res + (y @ lp["mlp"]["fc2"] + lp["mlp"]["b2"])
        return (h,), None

    body = remat_wrap(body, remat)
    layers = params["layers"]
    if cfg.feature_layer != -1:
        # stop at an earlier layer (CLIP/LLaVA feature select, e.g. -2)
        eff = cfg.num_layers + 1 + cfg.feature_layer
        layers = jax.tree_util.tree_map(lambda a: a[:eff], layers)
    (x,), _ = jax.lax.scan(body, (x,), layers)
    if x.shape[1] != s_real:
        x = x[:, :s_real]
    if cfg.post_ln_sequence:
        x = layer_norm(
            x, params["post_ln"]["scale"], params["post_ln"]["bias"],
            cfg.layer_norm_eps,
        )
    if cfg.use_class_token and cfg.drop_class_token:
        x = x[:, 1:]
    return x
