"""Training-step throughput benchmark (single chip).

Measures tokens/sec for the full VLM train step (vision encode + decoder
forward/backward with full remat + AdamW update) at the single-chip profile —
the training-side counterpart of bench.py's prefill metric.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(seq=2048, n_tiles=8, steps=5):
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
    # single-chip training budget: fp32 masters + two Adam moments need ~12
    # bytes/param — and the axon remote-compile helper rejects training
    # graphs past ~1B params (see .claude/skills/verify/SKILL.md). Scale the
    # profile to what compiles: 8-layer decoder + 12-layer vision tower.
    cfg = dataclasses.replace(
        cfg,
        text=dataclasses.replace(cfg.text, num_layers=8),
        vision=dataclasses.replace(cfg.vision, num_layers=12),
    )
    train_cfg = TrainConfig(
        seq_len=seq, global_batch_size=1, remat="full",
        optimizer=OptimizerConfig(lr=1e-5, warmup_steps=10, decay_steps=1000),
    )
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
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
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    print(
        f"train step: {seq / dt:.0f} tokens/s/chip "
        f"({dt * 1e3:.0f} ms/step, seq {seq}, {n_tiles} tiles, full remat)"
    )


if __name__ == "__main__":
    main()
