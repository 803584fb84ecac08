"""Chat template tests with a deterministic fake tokenizer (no network)."""

import numpy as np

from leopard_tpu.data.chat import (
    BEGIN_OF_TEXT,
    EOT_ID,
    RST,
    build_eval_prompt,
    build_llama3_chat,
    image_block_ids,
    render_images_into_text,
)


class FakeTokenizer:
    """Maps each character to a small id; special <|...|> strings to their
    llama-3 ids. Enough to test structure."""

    bos_token_id = BEGIN_OF_TEXT
    SPECIALS = {
        "<|start_header_id|>": 128006,
        "<|end_header_id|>": 128007,
        "<|eot_id|>": EOT_ID,
    }

    def __call__(self, text, add_special_tokens=False):
        ids = []
        i = 0
        while i < len(text):
            matched = False
            for s, tid in self.SPECIALS.items():
                if text.startswith(s, i):
                    ids.append(tid)
                    i += len(s)
                    matched = True
                    break
            if not matched:
                ids.append(ord(text[i]) % 1000)
                i += 1
        return {"input_ids": ids}

    def convert_tokens_to_ids(self, tok):
        import re

        m = re.match(r"<\|reserved_special_token_(\d+)\|>", tok)
        return RST[int(m.group(1))] if m else None


TOK = FakeTokenizer()
IMG = RST[250]


def test_image_block_train_layout():
    blocks = image_block_ids([2], tokens_per_tile=3, image_token_id=IMG, layout="train")
    b = blocks[0]
    # rst20, 3×img, rst22, 3×img, rst23, 3×img(original), rst21
    assert b[0] == RST[20]
    assert b[1:4] == [IMG] * 3
    assert b[4] == RST[22]
    assert b[5:8] == [IMG] * 3
    assert b[8] == RST[23]
    assert b[9:12] == [IMG] * 3
    assert b[12] == RST[21]
    assert len(b) == 13


def test_image_block_eval_layout():
    blocks = image_block_ids([2], tokens_per_tile=3, image_token_id=IMG, layout="eval")
    b = blocks[0]
    assert b[0] == RST[20]
    assert b[1:10] == [IMG] * 9  # (2 tiles + 1 original) × 3
    assert b[10] == RST[21]


def test_render_prepends_missing_placeholders():
    ids = render_images_into_text(TOK, "no placeholder here", [0, 0], 2, IMG)
    assert ids.count(IMG) == 2 * 2  # two images × (0 tiles + original) × 2 tok


def test_build_llama3_chat_loss_weights():
    sample = build_llama3_chat(
        TOK,
        [("user", "<image> what is this?"), ("assistant", "a cat")],
        tiles_per_image=[1],
        tokens_per_tile=2,
    )
    assert sample.input_ids[0] == BEGIN_OF_TEXT
    # image tokens present: (1 tile + original) × 2
    assert sample.num_image_tokens == 4
    # loss only on assistant tail
    assert sample.loss_weights.sum() > 0
    # user portion has zero weight
    img_positions = np.where(sample.input_ids == IMG)[0]
    assert np.all(sample.loss_weights[img_positions] == 0.0)
    # all weighted tokens come after the last user token
    weighted = np.where(sample.loss_weights > 0)[0]
    assert weighted.min() > img_positions.max()
    assert len(sample.input_ids) == len(sample.loss_weights)


def test_build_eval_prompt_structure():
    ids = build_eval_prompt(
        TOK, "<image> what?", [1], tokens_per_tile=2,
        instruction="Answer briefly.", image_token_id=IMG,
    )
    assert ids[0] == BEGIN_OF_TEXT
    assert (ids == IMG).sum() == 4  # (1 tile + original) × 2
    assert ids[-1] != EOT_ID  # ends with assistant header, ready to generate
    # contains rst20/21 delimiters
    assert RST[20] in ids and RST[21] in ids
