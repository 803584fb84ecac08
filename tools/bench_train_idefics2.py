"""Idefics2-family training throughput (single chip) — the SECOND model
family's train step measured on-chip, at the reference's Idefics2 shape
class (seq 8192, Mistral sliding-window decoder, NaViT-980 tower +
perceiver resampler; ≙ examples/idefics2/train_multiimg_idefics2.sh:52-88,
scaled to the ~0.8B profile whose fp32+Adam state fits one 16 GB v5e —
same ceiling as tools/bench_train.py).

Usage: python tools/bench_train_idefics2.py [--seq 8192] [--images 8]
       [--remat full] [--remat-vision full]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_FLOPS = 197e12


def main(seq=8192, n_images=4, steps=8, remat="full", remat_vision=None):
    import dataclasses

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from leopard_tpu import config as cfgs
    from leopard_tpu.config import OptimizerConfig, TrainConfig
    from leopard_tpu.models import vlm
    from leopard_tpu.training.trainer import create_train_state, make_train_step

    # ~0.8B total (text 0.51 + NaViT tower 0.19 + perceiver 0.10): the
    # largest Idefics2-shaped profile whose fp32+Adam state AND the
    # 4×(70×70)-patch tower activations fit one 16 GB v5e (8 images @ 8
    # text layers compiled at 20.2 G — over budget)
    text = dataclasses.replace(
        cfgs.mistral_7b(),
        vocab_size=32768, hidden_size=2048, intermediate_size=8192,
        num_layers=6, num_heads=16, num_kv_heads=8, head_dim=128,
    )
    vision = dataclasses.replace(cfgs.idefics2_vision(), num_layers=12)
    perceiver = cfgs.PerceiverConfig(
        num_latents=64, num_layers=3, hidden_size=2048, num_heads=16,
        num_kv_heads=4, head_dim=96, intermediate_size=4096,
    )
    cfg = cfgs.VLMConfig(
        vision=vision, text=text, perceiver=perceiver,
        projector=cfgs.ProjectorConfig(projector_type="none", input_size=2048),
        anyres=cfgs.AnyResConfig(tile_size=980, tile_budget=0,
                                 tokens_per_tile=64),
        image_token_id=32767, pixel_shuffle_factor=1,
        architecture="leopard_idefics2",
    )
    train_cfg = TrainConfig(
        seq_len=seq, global_batch_size=1, remat=remat,
        remat_vision=remat_vision,
        optimizer=OptimizerConfig(lr=1e-5, warmup_steps=10, decay_steps=1000),
    )
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    state = create_train_state(params, train_cfg)
    del params
    step = jax.jit(make_train_step(cfg, train_cfg), donate_argnums=(0,))

    lat = cfg.perceiver.num_latents
    ids = np.random.RandomState(0).randint(1, 30000, (1, seq)).astype(np.int32)
    for i in range(n_images):
        ids[0, 8 + i * (lat + 2) : 8 + i * (lat + 2) + lat] = cfg.image_token_id
    g = cfg.vision.image_size // cfg.vision.patch_size     # 70 patches/side
    batch = {
        "tokens": jnp.asarray(ids),
        "loss_weights": jnp.ones((1, seq), jnp.float32),
        "segment_ids": jnp.ones((1, seq), jnp.int32),
        "images": jnp.asarray(
            np.random.RandomState(1).randn(n_images, 3, 980, 980), jnp.bfloat16
        ),
        "patch_mask": jnp.ones((n_images, g, g), jnp.bool_),
    }

    state, metrics = step(state, batch)  # compile
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    mfu = 6 * n_params * seq / dt / V5E_BF16_FLOPS
    # token-weighted: the NaViT tower really sees n_images × 70×70 patches
    n_vis = sum(
        p.size for p in jax.tree_util.tree_leaves(state.params["vision"])
    )
    useful = 6 * ((n_params - n_vis) * seq + n_vis * n_images * g * g)
    mfu_tw = useful / dt / V5E_BF16_FLOPS
    print(
        f"idefics2 train step: {seq / dt:.0f} tokens/s/chip "
        f"({dt * 1e3:.0f} ms/step, {n_params / 1e9:.3f}B params, seq {seq}, "
        f"{n_images} images@980 (window {cfg.text.sliding_window}), "
        f"{remat} remat"
        f"{'' if remat_vision is None else f' (+{remat_vision} vision)'}) "
        f"MFU(6ND)={mfu * 100:.1f}% "
        f"MFU(token-weighted)={mfu_tw * 100:.1f}% loss={loss:.3f}"
    )


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--seq", type=int, default=8192)
    p.add_argument("--images", type=int, default=4)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--remat", default="full",
                   choices=("none", "selective", "attn", "full"))
    p.add_argument("--remat-vision", default=None,
                   choices=("none", "selective", "attn", "full"))
    a = p.parse_args()
    main(a.seq, a.images, a.steps, a.remat, a.remat_vision)
