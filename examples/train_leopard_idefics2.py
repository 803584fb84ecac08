"""Train Leopard-Idefics2 (NaViT encoder + perceiver + Mistral-7B).

Entry-point parity with examples/idefics2/pretrain_megatron_idefics2.py +
train_multiimg_idefics2.sh (seq 8192, GBS 1024, TP=8/SP). The data path uses
NaViT padded preprocessing (pixel/patch masks), the Idefics2 prompt layout,
and answer-mask loss weighting after <end_of_utterance>.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", required=True,
                   help="jsonl: {text: chat-rendered string with <image> "
                        "placeholders, images: [paths]}")
    p.add_argument("--image-folder", default="")
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--init-from", default=None)
    p.add_argument("--checkpoint-dir", default="checkpoints/leopard-idefics2")
    p.add_argument("--seq-len", type=int, default=8192)
    p.add_argument("--global-batch-size", type=int, default=1024)
    p.add_argument("--train-steps", type=int, default=10614)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--mesh", default="model=1")
    p.add_argument("--freeze-vision-tower", action="store_true")
    p.add_argument("--freeze-perceiver", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    from jax.sharding import NamedSharding, PartitionSpec as P
    from PIL import Image

    from leopard_tpu import config as cfgs
    from leopard_tpu.config import MeshConfig, OptimizerConfig, TrainConfig
    from leopard_tpu.data.chat import build_idefics2_prompt
    from leopard_tpu.data.idefics2_processor import (
        answer_loss_mask,
        preprocess_idefics2,
    )
    from leopard_tpu.data.tokenizer import build_tokenizer
    from leopard_tpu.models import vlm
    from leopard_tpu.parallel.mesh import build_mesh
    from leopard_tpu.parallel.sharding import param_shardings
    from leopard_tpu.training.checkpoint import CheckpointManager
    from leopard_tpu.training.loop import train
    from leopard_tpu.training.trainer import (
        TrainState,
        create_train_state,
        make_train_step,
    )
    from leopard_tpu.utils.timers import MetricsLogger

    cfg = cfgs.leopard_idefics2_8b()
    mesh_kw = dict(kv.split("=") for kv in args.mesh.split(","))
    mesh_cfg = MeshConfig(**{k: int(v) for k, v in mesh_kw.items()})
    mesh = build_mesh(mesh_cfg)
    train_cfg = TrainConfig(
        seq_len=args.seq_len, global_batch_size=args.global_batch_size,
        train_steps=args.train_steps,
        optimizer=OptimizerConfig(lr=args.lr, decay_steps=args.train_steps),
        mesh=mesh_cfg, checkpoint_dir=args.checkpoint_dir,
        freeze_vision_tower=args.freeze_vision_tower,
        freeze_perceiver=args.freeze_perceiver,
    )

    tokenizer = build_tokenizer(args.tokenizer, tokenizer_type="mistral",
                                image_token="<image>")
    if args.init_from:
        from leopard_tpu.convert.hf import convert_leopard_idefics2, load_hf_state_dict

        params = convert_leopard_idefics2(load_hf_state_dict(args.init_from), cfg)
    else:
        params = vlm.init_params(cfg, jax.random.PRNGKey(train_cfg.seed))

    state = create_train_state(params, train_cfg)
    del params
    p_shard = param_shardings(state.params, mesh, fsdp=mesh_cfg.fsdp > 1)
    replicated = NamedSharding(mesh, P())
    shape_to_shard = {}
    for leaf, sh in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(p_shard)):
        shape_to_shard.setdefault(tuple(leaf.shape), sh)
    state_sharding = TrainState(
        step=replicated, params=p_shard,
        opt_state=jax.tree_util.tree_map(
            lambda l: shape_to_shard.get(tuple(l.shape), replicated),
            state.opt_state,
        ),
    )
    state = jax.device_put(state, state_sharding)

    frozen = tuple(
        name for name, flag in (
            ("vision", train_cfg.freeze_vision_tower),
            ("perceiver", train_cfg.freeze_perceiver),
        ) if flag
    )
    step_fn = jax.jit(
        make_train_step(cfg, train_cfg, frozen=frozen),
        in_shardings=(state_sharding, None),
        out_shardings=(state_sharding, None),
        donate_argnums=(0,),
    )

    with open(args.manifest) as f:
        rows = [json.loads(l) for l in f if l.strip()]

    def batches():
        b = train_cfg.global_batch_size
        latents = cfg.perceiver.num_latents
        i = 0
        while True:
            chunk = [rows[(i + j) % len(rows)] for j in range(b)]
            i += b
            toks = np.zeros((b, train_cfg.seq_len), np.int32)
            seg = np.zeros((b, train_cfg.seq_len), np.int32)
            weights = np.zeros((b, train_cfg.seq_len), np.float32)
            all_imgs = []
            for r_i, row in enumerate(chunk):
                images = [
                    Image.open(os.path.join(args.image_folder, p)).convert("RGB")
                    for p in row.get("images", [])
                ]
                ids = build_idefics2_prompt(
                    tokenizer, row["text"], len(images),
                    image_seq_len=latents,
                    image_token_id=cfg.image_token_id,
                    fake_token_id=cfg.image_token_id - 1,
                )
                n = min(len(ids), train_cfg.seq_len)
                toks[r_i, :n] = ids[:n]
                seg[r_i, :n] = 1
                weights[r_i, :n] = answer_loss_mask(ids[:n])
                all_imgs.append(images)
            flat = [im for imgs in all_imgs for im in imgs]
            pix, _, patch_mask = preprocess_idefics2(flat) if flat else (
                np.zeros((0, 3, 378, 378), np.float32), None,
                np.zeros((0, 27, 27), bool),
            )
            yield {
                "tokens": toks, "segment_ids": seg, "loss_weights": weights,
                "images": pix, "patch_mask": patch_mask,
            }

    ckpt = CheckpointManager(train_cfg.checkpoint_dir,
                             async_save=train_cfg.async_checkpoint)
    logger = MetricsLogger(train_cfg.checkpoint_dir)
    final = train(cfg, train_cfg, state, step_fn, batches(), ckpt=ckpt,
                  logger=logger)
    print(f"done at step {int(final.step)}")


if __name__ == "__main__":
    main()
