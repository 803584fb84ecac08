"""Training-step throughput benchmark (single chip).

Measures tokens/sec and approximate MFU for the full VLM train step (vision
encode + decoder forward/backward, full remat everywhere incl. the tower,
Pallas flash attention fwd+bwd, AdamW update) — the training-side counterpart
of bench.py's prefill metric.

Profile: the largest Leopard-LLaVA-shaped model whose full fp32-master +
Adam training state fits one v5e chip's 16 GB HBM. Training state costs
~18 bytes/param (4 master + 8 Adam + 4 fp32 grads + 2 bf16 cast), so the
ceiling is ~0.85B params: hidden 2048 / 8 layers / GQA 16:8 / vocab 32768
decoder + 12-layer SigLIP tower = 0.836B. (The axon remote-compile helper
separately rejects training graphs ≳1B params — HBM binds first.)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_FLOPS = 197e12


def main(seq=4096, n_tiles=8, steps=8, remat="full", remat_vision=None,
         loss_chunk=1024):
    import dataclasses

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_single_chip_cfg
    from leopard_tpu.config import OptimizerConfig, TrainConfig
    from leopard_tpu.models import vlm
    from leopard_tpu.training.trainer import create_train_state, make_train_step

    cfg = _flagship_single_chip_cfg()
    cfg = dataclasses.replace(
        cfg,
        text=dataclasses.replace(cfg.text, num_layers=8, vocab_size=32768),
        vision=dataclasses.replace(cfg.vision, num_layers=12),
        image_token_id=32767,  # must stay inside the shrunk vocab
    )
    train_cfg = TrainConfig(
        seq_len=seq, global_batch_size=1, remat=remat,
        remat_vision=remat_vision, loss_chunk=loss_chunk,
        optimizer=OptimizerConfig(lr=1e-5, warmup_steps=10, decay_steps=1000),
    )
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    state = create_train_state(params, train_cfg)
    del params
    step = jax.jit(make_train_step(cfg, train_cfg), donate_argnums=(0,))

    ids = np.random.RandomState(0).randint(1, 1000, (1, seq)).astype(np.int32)
    ids[0, 8 : 8 + n_tiles * 169] = cfg.image_token_id
    batch = {
        "tokens": jnp.asarray(ids),
        "loss_weights": jnp.ones((1, seq), jnp.float32),
        "segment_ids": jnp.ones((1, seq), jnp.int32),
        "images": jnp.asarray(
            np.random.RandomState(1).randn(n_tiles, 3, 364, 364), jnp.bfloat16
        ),
    }

    state, metrics = step(state, batch)  # compile
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    # MFU counts useful model FLOPs only (6·N·D); full remat re-runs the
    # forward in the backward, so hardware utilization is ~4/3 of this
    mfu = 6 * n_params * seq / dt / V5E_BF16_FLOPS
    # token-weighted MFU: 6ND bills the vision tower at the TEXT sequence
    # length, but the tower actually processes n_tiles × 676 patch tokens
    # (at 48 tiles that's 2× the text tokens — 6ND then undercounts nearly
    # half the useful FLOPs). Weight each parameter group by the tokens it
    # really sees. The projector (169 tokens/tile) is lumped with text —
    # it is <1% of params.
    n_vis = sum(
        p.size for p in jax.tree_util.tree_leaves(state.params["vision"])
    )
    patches = (cfg.vision.image_size // cfg.vision.patch_size) ** 2
    useful = 6 * ((n_params - n_vis) * seq + n_vis * n_tiles * patches)
    mfu_tw = useful / dt / V5E_BF16_FLOPS
    print(
        f"train step: {seq / dt:.0f} tokens/s/chip "
        f"({dt * 1e3:.0f} ms/step, {n_params / 1e9:.3f}B params, seq {seq}, "
        f"{n_tiles} tiles, {remat} remat"
        f"{'' if remat_vision is None else f' (+{remat_vision} vision)'},"
        f" flash fwd+bwd) "
        f"MFU(6ND)={mfu * 100:.1f}% "
        f"MFU(token-weighted)={mfu_tw * 100:.1f}% loss={loss:.3f}"
    )


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--seq", type=int, default=4096)
    p.add_argument("--tiles", type=int, default=8)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--remat", default="full",
                   choices=("none", "selective", "attn", "full"))
    p.add_argument("--remat-vision", default=None,
                   choices=("none", "selective", "attn", "full"),
                   help="vision-tower recompute override (mixed policy); "
                        "default follows --remat")
    p.add_argument("--loss-chunk", type=int, default=1024,
                   help="chunked-CE scan granularity")
    a = p.parse_args()
    main(a.seq, a.tiles, a.steps, a.remat, a.remat_vision, a.loss_chunk)
