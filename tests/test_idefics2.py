"""Idefics2 path: perceiver parity vs HF, NaViT preprocessing, full VLM."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from leopard_tpu import config as cfgs  # noqa: E402
from leopard_tpu.convert import hf as convert_hf  # noqa: E402
from leopard_tpu.models import perceiver  # noqa: E402


def _tiny_perceiver_cfgs():
    from transformers.models.idefics2.configuration_idefics2 import (
        Idefics2PerceiverConfig,
    )

    hf_cfg = Idefics2PerceiverConfig(
        hidden_size=64,
        resampler_n_latents=8,
        resampler_depth=2,
        resampler_n_heads=4,
        resampler_head_dim=16,
        num_key_value_heads=2,
        rms_norm_eps=1e-6,
        attn_implementation="eager",
    )
    ours = cfgs.PerceiverConfig(
        num_latents=8, num_layers=2, hidden_size=64, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=96,
        rms_norm_eps=1e-6, dtype="float32",
    )
    return hf_cfg, ours


def test_perceiver_resampler_parity():
    from transformers.models.idefics2.modeling_idefics2 import (
        Idefics2PerceiverResampler,
    )

    torch.manual_seed(0)
    hf_cfg, ours = _tiny_perceiver_cfgs()
    model = Idefics2PerceiverResampler(hf_cfg).eval()
    # randomize latents (default init is ones)
    with torch.no_grad():
        model.latents.copy_(torch.randn_like(model.latents))

    sd = {f"model.connector.perceiver_resampler.{k}": v for k, v in model.state_dict().items()}
    # add a passthrough modality projection (identity-free test: random proj)
    vision_hidden = 32
    import torch.nn as nn

    gate = nn.Linear(vision_hidden, 96, bias=False)
    up = nn.Linear(vision_hidden, 96, bias=False)
    down = nn.Linear(96, 64, bias=False)
    torch.manual_seed(1)
    for m in (gate, up, down):
        nn.init.normal_(m.weight, std=0.05)
    sd["model.connector.modality_projection.gate_proj.weight"] = gate.weight
    sd["model.connector.modality_projection.up_proj.weight"] = up.weight
    sd["model.connector.modality_projection.down_proj.weight"] = down.weight

    params = convert_hf.convert_perceiver(sd, ours, "model.connector.")

    rng = np.random.RandomState(0)
    feats = rng.randn(2, 12, vision_hidden).astype(np.float32)
    seg = np.ones((2, 12), np.int32)
    seg[1, 8:] = 0  # padded patches on row 1

    # HF reference: modality projection + resampler with attention mask
    with torch.no_grad():
        ctx = down(nn.functional.silu(gate(torch.tensor(feats))) * up(torch.tensor(feats)))
        want = model(context=ctx, attention_mask=torch.tensor(seg)).numpy()

    got = np.asarray(
        perceiver.forward(params, ours, jnp.asarray(feats), jnp.asarray(seg))
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_perceiver_masking_matters():
    _, ours = _tiny_perceiver_cfgs()
    params = perceiver.init_params(ours, jax.random.PRNGKey(0), vision_hidden=32)
    feats = jnp.asarray(np.random.RandomState(0).randn(1, 10, 32), jnp.float32)
    seg_full = jnp.ones((1, 10), jnp.int32)
    seg_half = seg_full.at[:, 5:].set(0)
    a = perceiver.forward(params, ours, feats, seg_full)
    b = perceiver.forward(params, ours, feats, seg_half)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # masked context content must not affect output
    feats2 = feats.at[:, 5:].set(99.0)
    c = perceiver.forward(params, ours, feats2, seg_half)
    np.testing.assert_allclose(np.asarray(b), np.asarray(c), atol=1e-5)


def test_idefics2_preprocessing():
    from PIL import Image

    from leopard_tpu.data.idefics2_processor import preprocess_idefics2

    imgs = [Image.new("RGB", (1400, 700), (255, 0, 0)),
            Image.new("RGB", (200, 400), (0, 255, 0))]
    pixels, mask, patch_mask = preprocess_idefics2(imgs, shortest_edge=378, longest_edge=980)
    n, c, h, w = pixels.shape
    assert n == 2 and c == 3
    assert h % 14 == 0 and w % 14 == 0
    assert h <= 980 + 14 and w <= 980 + 14
    # row 0 is wide: full width real; row 1 narrow: right padding masked out
    assert mask[0, 0, :].all() or mask[0].any()
    assert not patch_mask[1, :, -1].all()
    # patch mask matches pixel mask structure
    assert patch_mask.shape == (2, h // 14, w // 14)


def test_idefics2_vlm_forward():
    cfg = cfgs.tiny_vlm()
    import dataclasses

    pcfg = cfgs.PerceiverConfig(
        num_latents=4, num_layers=1, hidden_size=cfg.text.hidden_size,
        num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=96,
        dtype="float32",
    )
    cfg = dataclasses.replace(cfg, perceiver=pcfg, architecture="leopard_idefics2",
                              pixel_shuffle_factor=1)
    from leopard_tpu.models import vlm

    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    img_tok = cfg.image_token_id
    tokens = np.array([[1, img_tok, img_tok, img_tok, img_tok, 7]], np.int32)
    images = jnp.asarray(np.random.RandomState(0).randn(1, 3, 56, 56), jnp.float32)
    logits, _ = vlm.forward(params, cfg, jnp.asarray(tokens), images=images)
    assert logits.shape == (1, 6, cfg.text.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_build_idefics2_prompt():
    from leopard_tpu.data.chat import build_idefics2_prompt

    class Tok:
        bos_token_id = 1

        def __call__(self, text, add_special_tokens=False):
            return {"input_ids": [ord(c) % 100 + 100 for c in text]}

    ids = build_idefics2_prompt(Tok(), "<image><image> hi", 2,
                                image_seq_len=3, image_token_id=900,
                                fake_token_id=800)
    ids = ids.tolist()
    # bos, fake, 3×img, fake(shared), 3×img, fake, text
    assert ids[0] == 1
    assert ids[1] == 800
    assert ids[2:5] == [900] * 3
    assert ids[5] == 800  # shared boundary (not doubled)
    assert ids[6:9] == [900] * 3
    assert ids[9] == 800
    assert ids.count(800) == 3


def test_answer_loss_mask():
    from leopard_tpu.data.idefics2_processor import answer_loss_mask

    eou = 32002
    # [q q q EOU p p p p p p a a EOU]
    ids = np.array([5, 6, 7, eou, 1, 2, 3, 4, 5, 6, 9, 9, eou])
    mask = answer_loss_mask(ids, eou)
    # answer span starts at start+6 = index 9, runs through closing EOU
    assert mask[:9].sum() == 0
    np.testing.assert_array_equal(mask[9:], 1.0)
    # truncated answer: odd count extends to end
    ids2 = np.array([5, eou, 0, 0, 0, 0, 0, 0, 8, 8])
    mask2 = answer_loss_mask(ids2, eou)
    assert mask2[7:].sum() == 3.0
