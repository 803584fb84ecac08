"""Op-level TPU profiling for the TRAIN step (VERDICT r3 item 4).

Builds the same single-chip train step as tools/bench_train.py (vision encode
+ decoder fwd/bwd + AdamW, configurable remat), captures a jax.profiler trace
of one step through the axon relay, and prints the per-op time table — the
breakdown bench_train's single wall-clock number can't give (flash fwd vs
flash bwd vs GEMMs vs CE vs remat recompute).

Usage:
  python tools/profile_train.py --seq 16384 --tiles 48 --remat attn
  python tools/profile_train.py --seq 4096 --tiles 8 --remat selective
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_inference import op_table  # noqa: E402


def main(seq=16384, n_tiles=48, remat="attn", remat_vision=None,
         trace_dir="/tmp/leopard_profile_train", top=40):
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
        image_token_id=32767,
    )
    train_cfg = TrainConfig(
        seq_len=seq, global_batch_size=1, remat=remat,
        remat_vision=remat_vision,
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
    _ = float(metrics["loss"])           # host sync (relay-safe)
    with jax.profiler.trace(trace_dir):
        state, metrics = step(state, batch)
        _ = float(metrics["loss"])

    print(f"--- train step (seq {seq}, {n_tiles} tiles, remat {remat}) ---")
    op_table(trace_dir, top=top)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--seq", type=int, default=16384)
    p.add_argument("--tiles", type=int, default=48)
    p.add_argument("--remat", default="attn",
                   choices=("none", "selective", "attn", "full"))
    p.add_argument("--remat-vision", default=None,
                   choices=("none", "selective", "attn", "full"))
    p.add_argument("--top", type=int, default=40)
    a = p.parse_args()
    main(a.seq, a.tiles, a.remat, a.remat_vision, top=a.top)
