"""Train Leopard-LLaVA (SigLIP-SO400M-364 + Llama-3.1-8B, anyres multi-image).

Entry-point parity with examples/llava/pretrain_megatron_llava.py +
train_multiimg_llava_siglip.sh — but one python file, typed configs, dotted
overrides instead of the 1,676-line flag registry:

  python examples/train_leopard_llava.py \
      --manifest data.jsonl --image-folder imgs/ \
      --tokenizer meta-llama/Llama-3.1-8B-Instruct \
      --init-from /ckpts/leopard-llava-hf \
      --set text.num_layers=32 --set mesh: via --mesh data=4,model=8 \
      --seq-len 16384 --global-batch-size 128
"""

from __future__ import annotations

import argparse
import ast
import dataclasses

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", required=True, help="jsonl SFT manifest")
    p.add_argument("--image-folder", default="")
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--init-from", default=None, help="HF checkpoint dir")
    p.add_argument("--checkpoint-dir", default="checkpoints/leopard-llava")
    p.add_argument("--seq-len", type=int, default=16384)
    p.add_argument("--global-batch-size", type=int, default=128)
    p.add_argument("--train-steps", type=int, default=10614)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--mesh", default="model=1",
                   help="comma list, e.g. data=4,fsdp=2,model=8")
    p.add_argument("--freeze-vision-tower", action="store_true")
    p.add_argument("--freeze-llm", action="store_true")
    p.add_argument("--tiny", action="store_true", help="tiny config smoke run")
    p.add_argument("--set", action="append", default=[],
                   help="dotted config override, e.g. text.num_layers=4")
    return p.parse_args()


def main():
    args = parse_args()
    from leopard_tpu import config as cfgs
    from leopard_tpu.config import MeshConfig, OptimizerConfig, TrainConfig
    from leopard_tpu.data.dataset import DataState, JsonlSftDataset, TrainDataLoader
    from leopard_tpu.data.processor import LeopardProcessor
    from leopard_tpu.data.tokenizer import build_tokenizer
    from leopard_tpu.models import vlm
    from leopard_tpu.parallel.mesh import build_mesh
    from leopard_tpu.parallel.sharding import param_shardings
    from leopard_tpu.training.checkpoint import CheckpointManager
    from leopard_tpu.training.loop import train
    from leopard_tpu.training.trainer import TrainState, create_train_state, make_train_step
    from leopard_tpu.utils.timers import MetricsLogger
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = cfgs.tiny_vlm() if args.tiny else cfgs.leopard_llava_8b()
    overrides = {}
    for item in args.set:
        path, value = item.split("=", 1)
        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
        overrides[path] = value
    cfg = cfgs.apply_overrides(cfg, overrides)

    mesh_kw = dict(kv.split("=") for kv in args.mesh.split(","))
    mesh_cfg = MeshConfig(**{k: int(v) for k, v in mesh_kw.items()})
    mesh = build_mesh(mesh_cfg)

    train_cfg = TrainConfig(
        seq_len=args.seq_len,
        global_batch_size=args.global_batch_size,
        train_steps=args.train_steps,
        optimizer=OptimizerConfig(lr=args.lr, decay_steps=args.train_steps),
        mesh=mesh_cfg,
        freeze_vision_tower=args.freeze_vision_tower,
        freeze_llm=args.freeze_llm,
        checkpoint_dir=args.checkpoint_dir,
    )

    tokenizer = build_tokenizer(args.tokenizer, model_parallel_size=mesh_cfg.model)

    if args.init_from:
        from leopard_tpu.convert.hf import convert_leopard_llava, load_hf_state_dict

        params = convert_leopard_llava(load_hf_state_dict(args.init_from), cfg)
    else:
        params = vlm.init_params(cfg, jax.random.PRNGKey(train_cfg.seed))

    state = create_train_state(params, train_cfg)
    del params
    p_shard = param_shardings(state.params, mesh, fsdp=mesh_cfg.fsdp > 1)
    replicated = NamedSharding(mesh, P())
    shape_to_shard = {}
    for pl_, sh in zip(jax.tree_util.tree_leaves(state.params),
                       jax.tree_util.tree_leaves(p_shard)):
        shape_to_shard.setdefault(tuple(pl_.shape), sh)
    state_sharding = TrainState(
        step=replicated,
        params=p_shard,
        opt_state=jax.tree_util.tree_map(
            lambda leaf: shape_to_shard.get(tuple(leaf.shape), replicated),
            state.opt_state,
        ),
    )
    state = jax.device_put(state, state_sharding)

    frozen = tuple(
        name for name, flag in (
            ("vision", train_cfg.freeze_vision_tower),
            ("text", train_cfg.freeze_llm),
        ) if flag
    )
    step_fn = jax.jit(
        make_train_step(cfg, train_cfg, frozen=frozen),
        in_shardings=(state_sharding, None),
        out_shardings=(state_sharding, None),
        donate_argnums=(0,),
    )

    data_state = DataState(seed=train_cfg.seed)
    ckpt = CheckpointManager(train_cfg.checkpoint_dir, async_save=train_cfg.async_checkpoint)
    latest = ckpt.latest_step()
    if latest is not None:
        from leopard_tpu.training.checkpoint import abstract_like

        state, ds = ckpt.restore(template=abstract_like(state))
        if ds:
            data_state = DataState.from_dict(ds)
        print(f"resumed from step {latest}")

    dataset = JsonlSftDataset(args.manifest, args.image_folder)
    processor = LeopardProcessor(cfg, tokenizer)
    dp_world = mesh_cfg.data * mesh_cfg.fsdp
    loader = TrainDataLoader(
        dataset, processor,
        batch_size=train_cfg.global_batch_size,
        seq_len=train_cfg.seq_len,
        dp_rank=0, dp_world=1,   # single-host; multi-host shards via jax.process_index()
        state=data_state,
    )

    def device_batches():
        batch_sharding = {
            "tokens": NamedSharding(mesh, P(("data", "fsdp"), None)),
            "loss_weights": NamedSharding(mesh, P(("data", "fsdp"), None)),
            "segment_ids": NamedSharding(mesh, P(("data", "fsdp"), None)),
            "images": NamedSharding(mesh, P(None, None, None, None)),
        }
        for batch in loader:
            d = batch.as_dict()
            yield {k: jax.device_put(v, batch_sharding[k]) for k, v in d.items()}

    logger = MetricsLogger(train_cfg.checkpoint_dir)
    final = train(cfg, train_cfg, state, step_fn, device_batches(),
                  data_state=data_state, ckpt=ckpt, logger=logger)
    print(f"done at step {int(final.step)}")


if __name__ == "__main__":
    main()
