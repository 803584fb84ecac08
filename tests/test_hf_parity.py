"""Numerical parity gates against HuggingFace reference implementations.

The reference's parity oracles are its HF checkpoints (README.md:46-49); with
no network access we instantiate tiny randomly-initialized HF models (torch
CPU) with matching configs, convert weights with leopard_tpu.convert.hf, and
require logits/feature agreement. This is the same gate the reference's
converters rely on, at unit-test scale.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from leopard_tpu import config as cfgs  # noqa: E402
from leopard_tpu.convert import hf as convert_hf  # noqa: E402
from leopard_tpu.models import decoder, projector, siglip, vlm  # noqa: E402


def _tiny_llama_cfg(**kw):
    from transformers import LlamaConfig

    defaults = dict(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        attention_bias=False,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    defaults.update(kw)
    return LlamaConfig(**defaults)


def _ours_from_llama(hf_cfg, rope_scaling=None) -> cfgs.TextConfig:
    return cfgs.TextConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        num_kv_heads=hf_cfg.num_key_value_heads,
        head_dim=hf_cfg.head_dim,
        rms_norm_eps=hf_cfg.rms_norm_eps,
        rope_theta=hf_cfg.rope_theta,
        rope_scaling=rope_scaling,
        dtype="float32",
    )


@pytest.fixture(scope="module")
def tiny_llama():
    from transformers import LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = _tiny_llama_cfg()
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = _ours_from_llama(hf_cfg)
    params = convert_hf.convert_decoder(model.state_dict(), cfg, "model.")
    return model, cfg, params


def test_llama_logits_parity(tiny_llama):
    model, cfg, params = tiny_llama
    tokens = np.array([[1, 5, 9, 42, 7, 100, 3, 250]], dtype=np.int32)
    with torch.no_grad():
        hf_logits = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    ours, _ = decoder.forward(params, cfg, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-4, atol=2e-4)


def test_llama_logits_parity_llama31_rope():
    from transformers import LlamaForCausalLM

    torch.manual_seed(1)
    hf_cfg = _tiny_llama_cfg(
        rope_theta=500000.0,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        },
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = cfgs.TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, rope_theta=500000.0,
        rope_scaling="llama3.1", dtype="float32",
    )
    params = convert_hf.convert_decoder(model.state_dict(), cfg, "model.")
    tokens = np.array([[3, 17, 200, 90, 12, 0]], dtype=np.int32)
    with torch.no_grad():
        hf_logits = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    ours, _ = decoder.forward(params, cfg, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-4, atol=2e-4)


def test_llama_kv_cache_decode_matches_full_forward(tiny_llama):
    model, cfg, params = tiny_llama
    tokens = np.array([[1, 5, 9, 42, 7, 100]], dtype=np.int32)
    full_logits, _ = decoder.forward(params, cfg, jnp.asarray(tokens))
    # prefill first 4, then decode 2 steps
    cache = decoder.KVCache.create(cfg, batch=1, max_len=8, dtype=jnp.float32)
    logits_p, cache = decoder.forward(params, cfg, jnp.asarray(tokens[:, :4]), cache=cache)
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, :4]), rtol=1e-4, atol=1e-4
    )
    for t in range(4, 6):
        step_logits, cache = decoder.forward(
            params, cfg, jnp.asarray(tokens[:, t : t + 1]), cache=cache
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full_logits[:, t]),
            rtol=1e-4,
            atol=1e-4,
        )


def test_mistral_sliding_window_parity():
    from transformers import MistralConfig, MistralForCausalLM

    torch.manual_seed(2)
    hf_cfg = MistralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, rope_theta=10000.0,
        sliding_window=4, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = MistralForCausalLM(hf_cfg).eval()
    cfg = cfgs.TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, rope_theta=10000.0,
        rope_scaling=None, sliding_window=4, dtype="float32",
        rms_norm_eps=hf_cfg.rms_norm_eps,
    )
    params = convert_hf.convert_decoder(model.state_dict(), cfg, "model.")
    tokens = np.array([[5, 1, 30, 99, 7, 201, 48, 66, 12, 3]], dtype=np.int32)
    with torch.no_grad():
        hf_logits = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    ours, _ = decoder.forward(params, cfg, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def tiny_siglip():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(3)
    hf_cfg = SiglipVisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
        attn_implementation="eager",
    )
    model = SiglipVisionModel(hf_cfg).eval()
    cfg = cfgs.VisionConfig(
        hidden_size=64, intermediate_size=128, num_layers=2, num_heads=4,
        image_size=56, patch_size=14, layer_norm_eps=hf_cfg.layer_norm_eps,
        dtype="float32",
    )
    params = convert_hf.convert_siglip_vision(model.state_dict(), cfg, "vision_model.")
    return model, cfg, params


def test_siglip_features_parity(tiny_siglip):
    model, cfg, params = tiny_siglip
    rng = np.random.RandomState(0)
    pixels = rng.randn(2, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        hf_out = model(torch.tensor(pixels)).last_hidden_state.numpy()
    ours = np.asarray(siglip.forward(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours, hf_out, rtol=2e-4, atol=2e-4)


def test_navit_position_ids_match_reference_bucketize():
    """Bucketized pos-ids vs a direct transcription of
    idefics_vision_tower.py:129-150 in torch."""
    n = 8  # patches per side of the pos table
    nph = npw = 8
    mask = np.zeros((2, nph, npw), dtype=bool)
    mask[0, :5, :7] = True  # 5×7 real patches
    mask[1, :8, :3] = True
    ours = np.asarray(siglip.navit_position_ids(jnp.asarray(mask), n))

    boundaries = torch.arange(1 / n, 1.0, 1 / n)
    want = np.zeros((2, nph * npw), dtype=np.int64)
    for b, m in enumerate(torch.tensor(mask)):
        nb_h = m[:, 0].sum()
        nb_w = m[0].sum()
        fh = torch.arange(0, 1 - 1e-6, 1 / nb_h)
        fw = torch.arange(0, 1 - 1e-6, 1 / nb_w)
        bh = torch.bucketize(fh, boundaries, right=True)
        bw = torch.bucketize(fw, boundaries, right=True)
        ids = (bh[:, None] * n + bw).flatten()
        flat = m.reshape(-1)
        want[b][flat.numpy()] = ids.numpy()
    np.testing.assert_array_equal(ours, want)


def test_projector_parity():
    import torch.nn as nn

    torch.manual_seed(4)
    lin1 = nn.Linear(32, 16)
    lin2 = nn.Linear(16, 16)
    sd = {
        "multi_modal_projector.linear_1.weight": lin1.weight,
        "multi_modal_projector.linear_1.bias": lin1.bias,
        "multi_modal_projector.linear_2.weight": lin2.weight,
        "multi_modal_projector.linear_2.bias": lin2.bias,
    }
    cfg = cfgs.ProjectorConfig(input_size=32, hidden_size=16, dtype="float32")
    params = convert_hf.convert_projector(sd, cfg)
    x = np.random.RandomState(1).randn(3, 32).astype(np.float32)
    with torch.no_grad():
        want = lin2(nn.functional.gelu(lin1(torch.tensor(x)))).numpy()
    got = np.asarray(projector.forward(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_roundtrip(tiny_llama):
    model, cfg, params = tiny_llama
    sd = convert_hf.export_decoder(params, cfg, "model.")
    params2 = convert_hf.convert_decoder(sd, cfg, "model.")
    tokens = jnp.asarray([[4, 8, 15, 16]], dtype=jnp.int32)
    a, _ = decoder.forward(params, cfg, tokens)
    b, _ = decoder.forward(params2, cfg, tokens)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_export_siglip_strict_hf_load(tiny_siglip):
    """export_siglip_vision must produce a state dict that loads strictly
    into HF SiglipVisionModel and reproduces its features."""
    model, cfg, params = tiny_siglip
    sd = convert_hf.export_siglip_vision(params, cfg, "vision_model.")
    from transformers import SiglipVisionConfig, SiglipVisionModel

    # vision_use_head=False: the pooling head is not part of the tower path
    # and is absent from Leopard checkpoints
    cfg2 = SiglipVisionConfig(**{**model.config.to_dict(), "vision_use_head": False})
    model2 = SiglipVisionModel(cfg2).eval()
    model2.load_state_dict({k: torch.tensor(v) for k, v in sd.items()}, strict=True)
    pixels = np.random.RandomState(3).randn(2, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        want = model(torch.tensor(pixels)).last_hidden_state.numpy()
        got = model2(torch.tensor(pixels)).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_perceiver_roundtrip_exact():
    """export_perceiver is the exact inverse of convert_perceiver on an HF
    Idefics2 connector state dict (key-by-key tensor equality)."""
    from transformers.models.idefics2.modeling_idefics2 import (
        Idefics2PerceiverResampler,
    )

    from tests.test_idefics2 import _tiny_perceiver_cfgs

    torch.manual_seed(11)
    hf_cfg, ours = _tiny_perceiver_cfgs()
    model = Idefics2PerceiverResampler(hf_cfg).eval()
    with torch.no_grad():
        model.latents.copy_(torch.randn_like(model.latents))
    sd = {
        f"model.connector.perceiver_resampler.{k}": v
        for k, v in model.state_dict().items()
    }
    import torch.nn as nn

    vision_hidden = 32
    for name, shape in (("gate_proj", (96, vision_hidden)),
                        ("up_proj", (96, vision_hidden)),
                        ("down_proj", (64, 96))):
        sd[f"model.connector.modality_projection.{name}.weight"] = torch.randn(shape)

    params = convert_hf.convert_perceiver(sd, ours, "model.connector.")
    out_sd = convert_hf.export_perceiver(params, ours, "model.connector.")
    assert set(out_sd) == set(sd)
    for k, v in out_sd.items():
        np.testing.assert_allclose(
            v, sd[k].detach().float().numpy(), rtol=1e-6, atol=1e-6, err_msg=k
        )


def _remap_to_runtime_layout(sd):
    """wyu1 checkpoint layout → the installed transformers' module layout
    (newer HF nests everything under `model.` and hoists lm_head)."""
    out = {}
    for k, v in sd.items():
        if k == "language_model.lm_head.weight":
            out["lm_head.weight"] = v
        elif k.startswith("language_model.model."):
            out["model.language_model." + k[len("language_model.model."):]] = v
        else:
            out["model." + k] = v
    return out


def test_export_full_llava_logit_parity():
    """Round-trip gate (VERDICT #5): random VLM params → export_leopard_llava
    → strict load into HF LlavaForConditionalGeneration → identical logits on
    a multi-image prompt."""
    import jax

    from transformers import (
        LlavaConfig,
        LlavaForConditionalGeneration,
        SiglipVisionConfig,
    )

    # pixel_shuffle_factor=1 matches stock HF Llava's projector wiring
    base = cfgs.tiny_vlm()
    cfg = cfgs.VLMConfig(
        vision=base.vision,
        text=base.text,
        projector=cfgs.ProjectorConfig(
            input_size=base.vision.hidden_size, hidden_size=64, dtype="float32"
        ),
        anyres=base.anyres,
        image_token_id=base.image_token_id,
        pixel_shuffle_factor=1,
    )
    params = vlm.init_params(cfg, __import__("jax").random.PRNGKey(42))
    sd = convert_hf.export_leopard_llava(params, cfg)

    vc = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
        attn_implementation="eager", vision_use_head=False,
    )
    tc = _tiny_llama_cfg(vocab_size=512, hidden_size=64)
    hf_cfg = LlavaConfig(
        vision_config=vc, text_config=tc, image_token_index=cfg.image_token_id,
        vision_feature_select_strategy="full", vision_feature_layer=-1,
        projector_hidden_act="gelu",
    )
    model = LlavaForConditionalGeneration(hf_cfg).eval()
    model.load_state_dict(
        {k: torch.tensor(v) for k, v in _remap_to_runtime_layout(sd).items()},
        strict=True,
    )

    n_tiles, tok_per_tile = 2, 16  # (56/14)² patches, no pixel shuffle
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 100, (1, 48)).astype(np.int64)
    ids[0, 4 : 4 + n_tiles * tok_per_tile] = cfg.image_token_id
    pixels = rng.randn(n_tiles, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        # the Leopard eval adapter feeds last_hidden_state (incl. the tower's
        # post-LN) through the projector and splices at image-token positions
        # (llava_multiimg_siglip_anyres.py:268-287); stock HF Llava instead
        # selects hidden_states[-1] (pre-post-LN), so build the merged embeds
        # the reference way and run the HF decoder on them.
        feats = model.model.vision_tower(torch.tensor(pixels)).last_hidden_state
        feats = model.model.multi_modal_projector(feats).reshape(-1, 64)
        embeds = model.get_input_embeddings()(torch.tensor(ids))
        embeds[ids == cfg.image_token_id] = feats
        want = model(inputs_embeds=embeds).logits.numpy()
    got, _ = vlm.forward(
        params, cfg, jnp.asarray(ids.astype(np.int32)), images=jnp.asarray(pixels)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_clip_vision_parity():
    """CLIP tower (class token, pre-LN, quick-GELU, feature layer -2, drop
    CLS) vs HF CLIPVisionModel hidden_states[-2][:, 1:]."""
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(5)
    hf_cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14,
        attn_implementation="eager",
    )
    model = CLIPVisionModel(hf_cfg).eval()
    cfg = cfgs.VisionConfig(
        hidden_size=64, intermediate_size=128, num_layers=3, num_heads=4,
        image_size=56, patch_size=14, layer_norm_eps=hf_cfg.layer_norm_eps,
        hidden_act="quick_gelu", use_class_token=True, pre_ln=True,
        patch_bias=False, drop_class_token=True, post_ln_sequence=False,
        feature_layer=-2, dtype="float32",
    )
    params = convert_hf.convert_clip_vision(model.state_dict(), cfg, "vision_model.")
    pixels = np.random.RandomState(7).randn(2, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        hs = model(torch.tensor(pixels), output_hidden_states=True).hidden_states
        want = hs[-2][:, 1:].numpy()  # penultimate layer, drop CLS
    from leopard_tpu.models import siglip

    got = np.asarray(siglip.forward(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
