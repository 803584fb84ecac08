"""LeopardProcessor: one object bundling anyres tiling, image normalization,
and chat tokenization — the single preprocessing path shared by training and
evaluation (the reference duplicates this logic between
mm_pretrain_dataset.py:65-201 and llava_multiimg_siglip_anyres.py:26-162;
SURVEY.md layer-map note says to unify)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from leopard_tpu.config import VLMConfig
from leopard_tpu.data.anyres import preprocess_tiles, tile_images
from leopard_tpu.data.chat import ChatSample, build_eval_prompt, build_llama3_chat


@dataclass
class ProcessedSample:
    input_ids: np.ndarray        # [S] int32
    loss_weights: np.ndarray     # [S] float32
    pixel_values: np.ndarray     # [N_crops, 3, T, T] float32
    tiles_per_image: List[int]

    @property
    def seq_len(self) -> int:
        return len(self.input_ids)


class LeopardProcessor:
    def __init__(self, cfg: VLMConfig, tokenizer, layout: str = "train",
                 pixel_dtype: str = "float32"):
        """pixel_dtype="uint8" emits raw [N, T, T, 3] uint8 tiles for
        DEVICE-side normalization (models/vlm.py::encode_images handles the
        dtype; 4× less host→device transfer — ≙ the reference's CVCUDA GPU
        preprocessing); "float32" normalizes on host (HF-processor-
        compatible [N, 3, T, T])."""
        assert pixel_dtype in ("float32", "uint8")
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.layout = layout
        self.pixel_dtype = pixel_dtype

    def process_images(self, images: Sequence[Image.Image], order: Optional[str] = None):
        from leopard_tpu.data.anyres import preprocess_tiles_uint8

        tiled = tile_images(
            images,
            tile_size=self.cfg.anyres.tile_size,
            total_budget=self.cfg.anyres.tile_budget,
            order=order or ("train" if self.layout == "train" else "eval"),
        )
        if self.pixel_dtype == "uint8":
            pixels = preprocess_tiles_uint8(
                tiled.tiles, tile_size=self.cfg.anyres.tile_size
            )
        else:
            pixels = preprocess_tiles(
                tiled.tiles,
                tile_size=self.cfg.anyres.tile_size,
                mean=self.cfg.anyres.image_mean,
                std=self.cfg.anyres.image_std,
            )
        return pixels, tiled.tiles_per_image

    def process_chat(
        self,
        messages: Sequence[Tuple[str, str]],
        images: Sequence[Image.Image],
    ) -> Optional[ProcessedSample]:
        """Training sample: chat template + anyres tiles. Returns None when
        the sample violates the reference's guards (>max_images,
        mm_pretrain_dataset.py:345)."""
        if len(images) > self.cfg.anyres.max_images:
            return None
        pixels, tiles_per_image = self.process_images(images)
        chat: ChatSample = build_llama3_chat(
            self.tokenizer,
            messages,
            tiles_per_image,
            self.cfg.anyres.tokens_per_tile,
            image_token_id=self.cfg.image_token_id,
            layout="train",
        )
        expected = sum((t + 1) for t in tiles_per_image) * self.cfg.anyres.tokens_per_tile
        if images and chat.num_image_tokens != expected:
            return None  # tokenization mismatch guard (≙ :750-760)
        return ProcessedSample(
            input_ids=chat.input_ids,
            loss_weights=chat.loss_weights,
            pixel_values=pixels,
            tiles_per_image=tiles_per_image,
        )

    def process_eval(
        self, question: str, images: Sequence[Image.Image], instruction: str = ""
    ):
        pixels, tiles_per_image = self.process_images(images, order="eval")
        ids = build_eval_prompt(
            self.tokenizer, question, tiles_per_image,
            self.cfg.anyres.tokens_per_tile,
            instruction=instruction,
            image_token_id=self.cfg.image_token_id,
        )
        return ids, pixels
