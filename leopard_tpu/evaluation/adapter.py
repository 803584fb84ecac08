"""Leopard model adapters for the evaluation harness.

Counterpart of evaluations/models/llava_multiimg_siglip_anyres.py (the HF
adapter) — but running on our TPU engine with the same prompt/crop protocol:
anyres tiling with eval crop order (original first), `image i:` blocks with
one tokens_per_tile run of image tokens per crop, greedy decode with
max_new_tokens=128 and eos {128001, 128009}.
"""

from __future__ import annotations

from typing import Optional, Sequence

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


class LeopardIdefics2EvalAdapter:
    """Idefics2 path: NaViT padded preprocessing + perceiver latents, ≤8
    images, fp16-class decode (≙ evaluations/models/idefics2_multiimg.py:22-70)."""

    def __init__(self, cfg: VLMConfig, params, tokenizer,
                 gen_cfg: Optional[GenerateConfig] = None, max_images: int = 8):
        from leopard_tpu.data.idefics2_processor import preprocess_idefics2

        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.max_images = max_images
        eos = tokenizer.convert_tokens_to_ids("<end_of_utterance>")
        self.gen_cfg = gen_cfg or GenerateConfig(
            max_new_tokens=128, greedy=True,
            eos_token_ids=tuple(t for t in (tokenizer.eos_token_id, eos) if t),
        )
        self.engine = Engine(cfg, params, self.gen_cfg)
        self._preprocess = preprocess_idefics2

    def __call__(self, row: dict, instruction: str) -> str:
        from leopard_tpu.data.chat import build_idefics2_prompt

        images = [
            Image.open(p).convert("RGB")
            for p in row["images_path"][: self.max_images]
        ]
        pixels, _, patch_mask = self._preprocess(images)
        question = row["question"]
        if row.get("concated_options"):
            question = f"{question}{row['concated_options']}"
        text = f"User:{question}\n{instruction}<end_of_utterance>\nAssistant:"
        prompt = build_idefics2_prompt(
            self.tokenizer, text, len(images),
            image_seq_len=self.cfg.perceiver.num_latents if self.cfg.perceiver else 64,
            image_token_id=self.cfg.image_token_id,
            fake_token_id=self.cfg.image_token_id - 1,
        )
        result = self.engine.generate(
            [prompt], images=pixels, patch_mask=patch_mask, gen_cfg=self.gen_cfg
        )
        return self.tokenizer.decode(
            result.tokens[0].tolist(), skip_special_tokens=True
        )
