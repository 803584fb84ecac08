"""On-chip MoE training profile (VERDICT r2 next #8): a ~0.5B dropless MoE
(8 experts, top-2) through the standard make_train_step on the real TPU —
evidence that the sort + lax.ragged_dot dispatch (ops/moe.py, ≙ MegaBlocks
dMoE, megablocks/layers/dmoe.py) compiles and performs on the real backend,
not just the CPU test mesh. Reports tokens/s and moe_fraction_dropped
(must be exactly 0 on the dropless path).

Usage: python tools/bench_moe.py [--seq 4096] [--steps 8] [--capacity]
(--capacity switches to the capacity-factor path for comparison; expect a
nonzero drop fraction there under imbalanced routing.)
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_FLOPS = 197e12


def main(seq=4096, steps=8, dropless=True):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from leopard_tpu import config as cfgs
    from leopard_tpu.config import OptimizerConfig, TrainConfig
    from leopard_tpu.models import vlm
    from leopard_tpu.training.trainer import create_train_state, make_train_step

    base = cfgs.tiny_vlm()
    text = cfgs.TextConfig(
        vocab_size=32768, hidden_size=1024, intermediate_size=2048,
        num_layers=8, num_heads=16, num_kv_heads=8, head_dim=64,
        num_experts=8, moe_top_k=2, moe_dropless=dropless,
        tie_word_embeddings=True, dtype="bfloat16", attn_impl="auto",
    )
    # text-only MoE: minimal stub tower (never run — no images in the batch)
    cfg = dataclasses.replace(base, text=text, image_token_id=32767)
    train_cfg = TrainConfig(
        seq_len=seq, global_batch_size=1, remat="full",
        optimizer=OptimizerConfig(lr=1e-5, warmup_steps=10, decay_steps=1000),
    )
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    # active params per token: shared + top_k/num_experts of the expert bank
    n_experts_p = sum(
        v.size for path, v in
        jax.tree_util.tree_leaves_with_path(params["text"])
        if any(getattr(k, "key", None) == "experts" for k in path)
    )
    n_active = n_params - n_experts_p * (1 - text.moe_top_k / text.num_experts)
    state = create_train_state(params, train_cfg)
    del params
    step = jax.jit(make_train_step(cfg, train_cfg), donate_argnums=(0,))

    ids = np.random.RandomState(0).randint(1, 30000, (1, seq)).astype(np.int32)
    batch = {
        "tokens": jnp.asarray(ids),
        "loss_weights": jnp.ones((1, seq), jnp.float32),
        "segment_ids": jnp.ones((1, seq), jnp.int32),
    }

    t0 = time.perf_counter()
    state, metrics = step(state, batch)  # compile
    loss = float(metrics["loss"])
    dropped = float(metrics["moe_fraction_dropped"])
    print(f"compiled in {time.perf_counter() - t0:.0f}s "
          f"(loss={loss:.3f}, fraction_dropped={dropped:.4f})")
    assert np.isfinite(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    dropped = float(metrics["moe_fraction_dropped"])  # also syncs
    dt = (time.perf_counter() - t0) / steps
    mfu = 6 * n_active * seq / dt / V5E_BF16_FLOPS
    mode = "dropless(ragged_dot)" if dropless else "capacity"
    print(
        f"MoE train step [{mode}]: {seq / dt:.0f} tokens/s/chip "
        f"({dt * 1e3:.0f} ms/step, {n_params / 1e9:.3f}B total / "
        f"{n_active / 1e9:.3f}B active, 8 experts top-2, seq {seq}, "
        f"full remat) MFU(6ND_active)={mfu * 100:.1f}% "
        f"fraction_dropped={dropped:.4f}"
    )
    if dropless:
        assert dropped == 0.0, "dropless path must never drop tokens"


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--seq", type=int, default=4096)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--capacity", action="store_true")
    a = p.parse_args()
    main(a.seq, a.steps, dropless=not a.capacity)
