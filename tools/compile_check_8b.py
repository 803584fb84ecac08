"""AOT shard-compile check of the full Leopard-LLaVA-8B training step.

Lowers and compiles the real flagship profile (SigLIP-SO400M-27L +
Llama-3.1-8B, seq configurable) over a virtual 8-device mesh with
TP/SP/FSDP shardings using abstract inputs — no parameters are ever
materialized, so this validates the full-scale partitioning on any host.

  python tools/compile_check_8b.py --mesh fsdp=2,seq=2,model=2 --seq 1024
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", default="fsdp=2,seq=2,model=2")
    p.add_argument("--seq", type=int, default=1024)
    p.add_argument("--devices", type=int, default=8)
    args = p.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from leopard_tpu import config as cfgs
    from leopard_tpu.config import MeshConfig, OptimizerConfig, TrainConfig
    from leopard_tpu.models import vlm
    from leopard_tpu.parallel.mesh import build_mesh
    from leopard_tpu.parallel.sharding import param_shardings
    from leopard_tpu.training.trainer import (
        TrainState,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    mesh_kw = dict(kv.split("=") for kv in args.mesh.split(","))
    sizes = {k: int(v) for k, v in mesh_kw.items()}
    mesh_cfg = MeshConfig(
        data=sizes.get("data", 1), fsdp=sizes.get("fsdp", 1),
        expert=sizes.get("expert", 1), seq=sizes.get("seq", 1),
        model=sizes.get("model", 1),
    )
    mesh = build_mesh(mesh_cfg, jax.devices()[: mesh_cfg.num_devices])

    cfg = cfgs.leopard_llava_8b()
    train_cfg = TrainConfig(
        seq_len=args.seq, global_batch_size=mesh_cfg.data * mesh_cfg.fsdp,
        remat="full",
        optimizer=OptimizerConfig(lr=1e-5, warmup_steps=10, decay_steps=100),
        mesh=mesh_cfg,
    )

    # abstract state: shapes/dtypes from eval_shape — nothing materialized
    def init():
        params = vlm.init_params(cfg, jax.random.PRNGKey(0))
        return create_train_state(params, train_cfg)

    state_shape = jax.eval_shape(init)
    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(state_shape.params)
    )
    print(f"flagship profile: {n_params/1e9:.2f}B master params; mesh={sizes}")

    p_shard = param_shardings(state_shape.params, mesh, fsdp=mesh_cfg.fsdp > 1)
    replicated = NamedSharding(mesh, P())
    shape_to_shard = {}
    for leaf, sh in zip(
        jax.tree_util.tree_leaves(state_shape.params),
        jax.tree_util.tree_leaves(p_shard),
    ):
        shape_to_shard.setdefault(tuple(leaf.shape), sh)
    state_sharding = TrainState(
        step=replicated,
        params=p_shard,
        opt_state=jax.tree_util.tree_map(
            lambda l: shape_to_shard.get(tuple(getattr(l, "shape", ())), replicated),
            state_shape.opt_state,
        ),
    )

    b, s = train_cfg.global_batch_size, args.seq
    n_tiles = 8
    batch_shapes = {
        "tokens": jax.ShapeDtypeStruct((b, s), jnp.int32),
        "loss_weights": jax.ShapeDtypeStruct((b, s), jnp.float32),
        "segment_ids": jax.ShapeDtypeStruct((b, s), jnp.int32),
        "images": jax.ShapeDtypeStruct((n_tiles, 3, 364, 364), jnp.bfloat16),
    }
    batch_sharding = {
        "tokens": NamedSharding(mesh, P(("data", "fsdp"), "seq")),
        "loss_weights": NamedSharding(mesh, P(("data", "fsdp"), "seq")),
        "segment_ids": NamedSharding(mesh, P(("data", "fsdp"), "seq")),
        "images": NamedSharding(mesh, P()),
    }
    state_abstract = jax.tree_util.tree_map(
        lambda l, sh: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=sh),
        state_shape, state_sharding,
    )
    batch_abstract = {
        k: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=batch_sharding[k])
        for k, v in batch_shapes.items()
    }

    step_fn = jax.jit(
        make_train_step(cfg, train_cfg),
        in_shardings=(state_sharding, batch_sharding),
        out_shardings=(state_sharding, None),
        donate_argnums=(0,),
    )
    lowered = step_fn.lower(state_abstract, batch_abstract)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    per_device = getattr(mem, "temp_size_in_bytes", 0) + getattr(
        mem, "argument_size_in_bytes", 0
    )
    print("8B train step compiled AOT over the sharded mesh.")
    if per_device:
        print(f"per-device arg+temp memory: {per_device/2**30:.2f} GiB")


if __name__ == "__main__":
    main()
