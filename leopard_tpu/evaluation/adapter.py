"""Leopard model adapters for the evaluation harness.

Counterpart of evaluations/models/llava_multiimg_siglip_anyres.py (the HF
adapter) — but running on our TPU engine with the same prompt/crop protocol:
anyres tiling with eval crop order (original first), `image i:` blocks with
one tokens_per_tile run of image tokens per crop, greedy decode with
max_new_tokens=128 and eos {128001, 128009}.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from PIL import Image

from leopard_tpu.config import GenerateConfig, VLMConfig
from leopard_tpu.data.anyres import preprocess_tiles, tile_images
from leopard_tpu.data.chat import build_eval_prompt
from leopard_tpu.inference.engine import Engine


class LeopardLlavaEvalAdapter:
    """infer_fn provider for evaluation.harness.run_benchmark."""

    def __init__(
        self,
        cfg: VLMConfig,
        params,
        tokenizer,
        gen_cfg: Optional[GenerateConfig] = None,
        layout: str = "eval",
        max_images: int = 50,
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.layout = layout
        self.max_images = max_images
        self.gen_cfg = gen_cfg or GenerateConfig(
            max_new_tokens=128, greedy=True, eos_token_ids=(128001, 128009)
        )
        self.engine = Engine(cfg, params, self.gen_cfg)

    def load_images(self, paths: Sequence[str]):
        return [Image.open(p).convert("RGB") for p in paths]

    def __call__(self, row: dict, instruction: str) -> str:
        images = self.load_images(row["images_path"][: self.max_images])
        tiled = tile_images(
            images,
            tile_size=self.cfg.anyres.tile_size,
            total_budget=self.cfg.anyres.tile_budget,
            order="eval" if self.layout == "eval" else "train",
        )
        pixels = preprocess_tiles(
            tiled.tiles,
            tile_size=self.cfg.anyres.tile_size,
            mean=self.cfg.anyres.image_mean,
            std=self.cfg.anyres.image_std,
        )
        question = row["question"]
        if row.get("concated_options"):
            question = f"{question}{row['concated_options']}"
        prompt = build_eval_prompt(
            self.tokenizer,
            question,
            tiled.tiles_per_image,
            self.cfg.anyres.tokens_per_tile,
            instruction=instruction,
            image_token_id=self.cfg.image_token_id,
            layout=self.layout,
        )
        result = self.engine.generate([prompt], images=pixels, gen_cfg=self.gen_cfg)
        return self.tokenizer.decode(
            result.tokens[0].tolist(), skip_special_tokens=True
        )
