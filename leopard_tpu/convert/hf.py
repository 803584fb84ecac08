"""HF checkpoint ↔ leopard-tpu parameter conversion.

Counterpart of the reference's bidirectional converter
(toolkits/model_checkpoints_convertor/llava/hf2megatron_llava.py) — but much
simpler by design: we use the HF half-rotation RoPE layout natively, so no QKV
interleave reordering (:244-309 there) and no TP shard split/merge (:184-216)
are needed. Sharding happens at load time via NamedSharding placement.

Layout notes:
  - HF Linear stores [out, in]; our params store [in, out] → transpose.
  - Per-layer HF tensors are stacked on a leading layer axis (lax.scan layout).
  - The Leopard-LLaVA HF checkpoint (wyu1/Leopard-LLaVA) is a
    LlavaForConditionalGeneration: `vision_tower.vision_model.*`,
    `multi_modal_projector.linear_{1,2}.*`, `language_model.model.*`
    (evaluations/models/llava_multiimg_siglip_anyres.py:179-230 is the spec).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from leopard_tpu.config import (
    ProjectorConfig,
    TextConfig,
    VisionConfig,
    VLMConfig,
)


Array = np.ndarray
StateDict = Mapping[str, Array]


def _to_np(x) -> np.ndarray:
    """Accept torch tensors or numpy arrays."""
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (possibly bf16): go through float32
    return x.detach().to(dtype=_torch().float32).cpu().numpy()


def _torch():
    import torch

    return torch


def _stack(sd: StateDict, template: str, n: int, transpose: bool = False) -> np.ndarray:
    arrs = []
    for i in range(n):
        a = _to_np(sd[template.format(i=i)])
        arrs.append(a.T if transpose else a)
    return np.stack(arrs)


def convert_decoder(
    sd: StateDict,
    cfg: TextConfig,
    prefix: str = "model.",
    lm_head_key: Optional[str] = None,
) -> dict:
    """HF LlamaForCausalLM / MistralForCausalLM state dict → decoder params."""
    L = cfg.num_layers
    p = prefix
    dt = jnp.dtype(cfg.dtype)

    def cast(a):
        return jnp.asarray(a, dtype=dt)

    params = {
        "embed_tokens": cast(_to_np(sd[f"{p}embed_tokens.weight"])),
        "layers": {
            "input_norm": cast(_stack(sd, p + "layers.{i}.input_layernorm.weight", L)),
            "attn": {
                "wq": cast(_stack(sd, p + "layers.{i}.self_attn.q_proj.weight", L, transpose=True)),
                "wk": cast(_stack(sd, p + "layers.{i}.self_attn.k_proj.weight", L, transpose=True)),
                "wv": cast(_stack(sd, p + "layers.{i}.self_attn.v_proj.weight", L, transpose=True)),
                "wo": cast(_stack(sd, p + "layers.{i}.self_attn.o_proj.weight", L, transpose=True)),
            },
            "post_attn_norm": cast(
                _stack(sd, p + "layers.{i}.post_attention_layernorm.weight", L)
            ),
            "mlp": {
                "w_gate": cast(_stack(sd, p + "layers.{i}.mlp.gate_proj.weight", L, transpose=True)),
                "w_up": cast(_stack(sd, p + "layers.{i}.mlp.up_proj.weight", L, transpose=True)),
                "w_down": cast(_stack(sd, p + "layers.{i}.mlp.down_proj.weight", L, transpose=True)),
            },
        },
        "final_norm": cast(_to_np(sd[f"{p}norm.weight"])),
    }
    if not cfg.tie_word_embeddings:
        if lm_head_key is None:
            # lm_head sits beside the decoder: model.* → lm_head.weight;
            # language_model.model.* → language_model.lm_head.weight
            candidates = [
                prefix[: -len("model.")] + "lm_head.weight"
                if prefix.endswith("model.") else prefix + "lm_head.weight",
                "lm_head.weight",
            ]
            lm_head_key = next((c for c in candidates if c in sd), candidates[0])
        params["lm_head"] = cast(_to_np(sd[lm_head_key]).T)
    return params


def convert_siglip_vision(
    sd: StateDict, cfg: VisionConfig, prefix: str = "vision_model."
) -> dict:
    """HF SiglipVisionModel state dict → siglip params."""
    L = cfg.num_layers
    p = prefix
    dt = jnp.dtype(cfg.dtype)

    def cast(a):
        return jnp.asarray(a, dtype=dt)

    conv_w = _to_np(sd[f"{p}embeddings.patch_embedding.weight"])  # [H, C, ph, pw]
    h = conv_w.shape[0]
    # flatten (C, ph, pw) in that order to match patchify()'s unfold layout
    kernel = conv_w.reshape(h, -1).T

    def lyr(name, transpose=False):
        return cast(_stack(sd, p + "encoder.layers.{i}." + name, L, transpose=transpose))

    return {
        "patch_embed": {
            "kernel": cast(kernel),
            "bias": cast(_to_np(sd[f"{p}embeddings.patch_embedding.bias"])),
        },
        "pos_embed": cast(_to_np(sd[f"{p}embeddings.position_embedding.weight"])),
        "layers": {
            "ln1": {"scale": lyr("layer_norm1.weight"), "bias": lyr("layer_norm1.bias")},
            "attn": {
                "wq": lyr("self_attn.q_proj.weight", transpose=True),
                "bq": lyr("self_attn.q_proj.bias"),
                "wk": lyr("self_attn.k_proj.weight", transpose=True),
                "bk": lyr("self_attn.k_proj.bias"),
                "wv": lyr("self_attn.v_proj.weight", transpose=True),
                "bv": lyr("self_attn.v_proj.bias"),
                "wo": lyr("self_attn.out_proj.weight", transpose=True),
                "bo": lyr("self_attn.out_proj.bias"),
            },
            "ln2": {"scale": lyr("layer_norm2.weight"), "bias": lyr("layer_norm2.bias")},
            "mlp": {
                "fc1": lyr("mlp.fc1.weight", transpose=True),
                "b1": lyr("mlp.fc1.bias"),
                "fc2": lyr("mlp.fc2.weight", transpose=True),
                "b2": lyr("mlp.fc2.bias"),
            },
        },
        "post_ln": {
            "scale": cast(_to_np(sd[f"{p}post_layernorm.weight"])),
            "bias": cast(_to_np(sd[f"{p}post_layernorm.bias"])),
        },
    }


def convert_clip_vision(
    sd: StateDict, cfg: VisionConfig, prefix: str = "vision_model."
) -> dict:
    """HF CLIPVisionModel state dict → vision params (class token, pre-LN,
    quick-GELU; the legacy clip-vit-large-patch14-336 tower,
    clip_encoder.py:74-315)."""
    L = cfg.num_layers
    p = prefix
    dt = jnp.dtype(cfg.dtype)

    def cast(a):
        return jnp.asarray(a, dtype=dt)

    conv_w = _to_np(sd[f"{p}embeddings.patch_embedding.weight"])
    h = conv_w.shape[0]
    kernel = conv_w.reshape(h, -1).T

    def lyr(name, transpose=False):
        return cast(_stack(sd, p + "encoder.layers.{i}." + name, L, transpose=transpose))

    return {
        "patch_embed": {"kernel": cast(kernel)},
        "class_embed": cast(_to_np(sd[f"{p}embeddings.class_embedding"])),
        "pos_embed": cast(_to_np(sd[f"{p}embeddings.position_embedding.weight"])),
        "pre_ln": {
            "scale": cast(_to_np(sd[f"{p}pre_layrnorm.weight"])),
            "bias": cast(_to_np(sd[f"{p}pre_layrnorm.bias"])),
        },
        "layers": {
            "ln1": {"scale": lyr("layer_norm1.weight"), "bias": lyr("layer_norm1.bias")},
            "attn": {
                "wq": lyr("self_attn.q_proj.weight", transpose=True),
                "bq": lyr("self_attn.q_proj.bias"),
                "wk": lyr("self_attn.k_proj.weight", transpose=True),
                "bk": lyr("self_attn.k_proj.bias"),
                "wv": lyr("self_attn.v_proj.weight", transpose=True),
                "bv": lyr("self_attn.v_proj.bias"),
                "wo": lyr("self_attn.out_proj.weight", transpose=True),
                "bo": lyr("self_attn.out_proj.bias"),
            },
            "ln2": {"scale": lyr("layer_norm2.weight"), "bias": lyr("layer_norm2.bias")},
            "mlp": {
                "fc1": lyr("mlp.fc1.weight", transpose=True),
                "b1": lyr("mlp.fc1.bias"),
                "fc2": lyr("mlp.fc2.weight", transpose=True),
                "b2": lyr("mlp.fc2.bias"),
            },
        },
        "post_ln": {
            "scale": cast(_to_np(sd[f"{p}post_layernorm.weight"])),
            "bias": cast(_to_np(sd[f"{p}post_layernorm.bias"])),
        },
    }


def convert_projector(
    sd: StateDict, cfg: ProjectorConfig, prefix: str = "multi_modal_projector."
) -> dict:
    dt = jnp.dtype(cfg.dtype)
    return {
        "fc1": jnp.asarray(_to_np(sd[f"{prefix}linear_1.weight"]).T, dt),
        "b1": jnp.asarray(_to_np(sd[f"{prefix}linear_1.bias"]), dt),
        "fc2": jnp.asarray(_to_np(sd[f"{prefix}linear_2.weight"]).T, dt),
        "b2": jnp.asarray(_to_np(sd[f"{prefix}linear_2.bias"]), dt),
    }


def convert_leopard_llava(sd: StateDict, cfg: VLMConfig) -> dict:
    """Full Leopard-LLaVA HF checkpoint → VLM params."""
    return {
        "vision": convert_siglip_vision(sd, cfg.vision, "vision_tower.vision_model."),
        "projector": convert_projector(sd, cfg.projector, "multi_modal_projector."),
        "text": convert_decoder(sd, cfg.text, "language_model.model."),
    }


def convert_perceiver(
    sd: StateDict, cfg, prefix: str = "model.connector."
) -> dict:
    """HF Idefics2Connector (modality projection + perceiver resampler) →
    perceiver params."""
    from leopard_tpu.config import PerceiverConfig  # noqa: F401 (doc)

    L = cfg.num_layers
    p = prefix
    dt = jnp.dtype(cfg.dtype)

    def cast(a):
        return jnp.asarray(a, dtype=dt)

    rp = p + "perceiver_resampler."
    return {
        "modality_proj": {
            "w_gate": cast(_to_np(sd[p + "modality_projection.gate_proj.weight"]).T),
            "w_up": cast(_to_np(sd[p + "modality_projection.up_proj.weight"]).T),
            "w_down": cast(_to_np(sd[p + "modality_projection.down_proj.weight"]).T),
        },
        "latents": cast(_to_np(sd[rp + "latents"])),
        "layers": {
            "latents_norm": cast(_stack(sd, rp + "layers.{i}.input_latents_norm.weight", L)),
            "context_norm": cast(_stack(sd, rp + "layers.{i}.input_context_norm.weight", L)),
            "attn": {
                "wq": cast(_stack(sd, rp + "layers.{i}.self_attn.q_proj.weight", L, transpose=True)),
                "wk": cast(_stack(sd, rp + "layers.{i}.self_attn.k_proj.weight", L, transpose=True)),
                "wv": cast(_stack(sd, rp + "layers.{i}.self_attn.v_proj.weight", L, transpose=True)),
                "wo": cast(_stack(sd, rp + "layers.{i}.self_attn.o_proj.weight", L, transpose=True)),
            },
            "post_attn_norm": cast(
                _stack(sd, rp + "layers.{i}.post_attention_layernorm.weight", L)
            ),
            "mlp": {
                "w_gate": cast(_stack(sd, rp + "layers.{i}.mlp.gate_proj.weight", L, transpose=True)),
                "w_up": cast(_stack(sd, rp + "layers.{i}.mlp.up_proj.weight", L, transpose=True)),
                "w_down": cast(_stack(sd, rp + "layers.{i}.mlp.down_proj.weight", L, transpose=True)),
            },
        },
        "final_norm": cast(_to_np(sd[rp + "norm.weight"])),
    }


def convert_leopard_idefics2(sd: StateDict, cfg: VLMConfig) -> dict:
    """Full Idefics2ForConditionalGeneration HF checkpoint → VLM params."""
    params = {
        "vision": convert_siglip_vision(sd, cfg.vision, "model.vision_model."),
        "perceiver": convert_perceiver(sd, cfg.perceiver, "model.connector."),
        "text": convert_decoder(sd, cfg.text, "model.text_model."),
        "projector": {},
    }
    return params


# ---------------------------------------------------------------------------
# Reverse direction (our params → HF state dict), for eval-harness export
# parity with hf2megatron_llava.py --convert_checkpoint_from_megatron_to_transformers.
# ---------------------------------------------------------------------------


def export_decoder(params: dict, cfg: TextConfig, prefix: str = "model.") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    p = prefix
    out[f"{p}embed_tokens.weight"] = np.asarray(params["embed_tokens"], np.float32)
    layers = params["layers"]
    for i in range(cfg.num_layers):
        out[f"{p}layers.{i}.input_layernorm.weight"] = np.asarray(layers["input_norm"][i], np.float32)
        out[f"{p}layers.{i}.self_attn.q_proj.weight"] = np.asarray(layers["attn"]["wq"][i], np.float32).T
        out[f"{p}layers.{i}.self_attn.k_proj.weight"] = np.asarray(layers["attn"]["wk"][i], np.float32).T
        out[f"{p}layers.{i}.self_attn.v_proj.weight"] = np.asarray(layers["attn"]["wv"][i], np.float32).T
        out[f"{p}layers.{i}.self_attn.o_proj.weight"] = np.asarray(layers["attn"]["wo"][i], np.float32).T
        out[f"{p}layers.{i}.post_attention_layernorm.weight"] = np.asarray(layers["post_attn_norm"][i], np.float32)
        out[f"{p}layers.{i}.mlp.gate_proj.weight"] = np.asarray(layers["mlp"]["w_gate"][i], np.float32).T
        out[f"{p}layers.{i}.mlp.up_proj.weight"] = np.asarray(layers["mlp"]["w_up"][i], np.float32).T
        out[f"{p}layers.{i}.mlp.down_proj.weight"] = np.asarray(layers["mlp"]["w_down"][i], np.float32).T
    out[f"{p}norm.weight"] = np.asarray(params["final_norm"], np.float32)
    if "lm_head" in params:
        parent = prefix.rsplit("model.", 1)[0]
        out[parent + "lm_head.weight"] = np.asarray(params["lm_head"], np.float32).T
    return out


def _f32(a) -> np.ndarray:
    return np.asarray(a, np.float32)


def export_siglip_vision(
    params: dict, cfg: VisionConfig, prefix: str = "vision_model."
) -> Dict[str, np.ndarray]:
    """Inverse of convert_siglip_vision: siglip params → HF SiglipVisionModel
    keys (hf2megatron_llava.py:41-48 export direction, vision mapping
    vlm_model.py:684-791)."""
    out: Dict[str, np.ndarray] = {}
    p = prefix
    ps = cfg.patch_size
    kernel = _f32(params["patch_embed"]["kernel"])              # [C*ps*ps, H]
    h = kernel.shape[1]
    out[f"{p}embeddings.patch_embedding.weight"] = kernel.T.reshape(
        h, cfg.num_channels, ps, ps
    )
    if "bias" in params["patch_embed"]:
        out[f"{p}embeddings.patch_embedding.bias"] = _f32(params["patch_embed"]["bias"])
    out[f"{p}embeddings.position_embedding.weight"] = _f32(params["pos_embed"])
    if "class_embed" in params:
        out[f"{p}embeddings.class_embedding"] = _f32(params["class_embed"])
    if "pre_ln" in params:
        out[f"{p}pre_layrnorm.weight"] = _f32(params["pre_ln"]["scale"])
        out[f"{p}pre_layrnorm.bias"] = _f32(params["pre_ln"]["bias"])
    layers = params["layers"]
    for i in range(cfg.num_layers):
        lp = f"{p}encoder.layers.{i}."
        out[lp + "layer_norm1.weight"] = _f32(layers["ln1"]["scale"][i])
        out[lp + "layer_norm1.bias"] = _f32(layers["ln1"]["bias"][i])
        for ours, theirs in (("wq", "q_proj"), ("wk", "k_proj"),
                             ("wv", "v_proj"), ("wo", "out_proj")):
            out[lp + f"self_attn.{theirs}.weight"] = _f32(layers["attn"][ours][i]).T
            out[lp + f"self_attn.{theirs}.bias"] = _f32(
                layers["attn"]["b" + ours[1]][i]
            )
        out[lp + "layer_norm2.weight"] = _f32(layers["ln2"]["scale"][i])
        out[lp + "layer_norm2.bias"] = _f32(layers["ln2"]["bias"][i])
        out[lp + "mlp.fc1.weight"] = _f32(layers["mlp"]["fc1"][i]).T
        out[lp + "mlp.fc1.bias"] = _f32(layers["mlp"]["b1"][i])
        out[lp + "mlp.fc2.weight"] = _f32(layers["mlp"]["fc2"][i]).T
        out[lp + "mlp.fc2.bias"] = _f32(layers["mlp"]["b2"][i])
    out[f"{p}post_layernorm.weight"] = _f32(params["post_ln"]["scale"])
    out[f"{p}post_layernorm.bias"] = _f32(params["post_ln"]["bias"])
    return out


def export_projector(
    params: dict, prefix: str = "multi_modal_projector."
) -> Dict[str, np.ndarray]:
    return {
        f"{prefix}linear_1.weight": _f32(params["fc1"]).T,
        f"{prefix}linear_1.bias": _f32(params["b1"]),
        f"{prefix}linear_2.weight": _f32(params["fc2"]).T,
        f"{prefix}linear_2.bias": _f32(params["b2"]),
    }


def export_perceiver(
    params: dict, cfg, prefix: str = "model.connector."
) -> Dict[str, np.ndarray]:
    """Inverse of convert_perceiver (HF Idefics2Connector layout)."""
    out: Dict[str, np.ndarray] = {}
    p = prefix
    rp = p + "perceiver_resampler."
    mp = params["modality_proj"]
    out[p + "modality_projection.gate_proj.weight"] = _f32(mp["w_gate"]).T
    out[p + "modality_projection.up_proj.weight"] = _f32(mp["w_up"]).T
    out[p + "modality_projection.down_proj.weight"] = _f32(mp["w_down"]).T
    out[rp + "latents"] = _f32(params["latents"])
    layers = params["layers"]
    for i in range(cfg.num_layers):
        lp = rp + f"layers.{i}."
        out[lp + "input_latents_norm.weight"] = _f32(layers["latents_norm"][i])
        out[lp + "input_context_norm.weight"] = _f32(layers["context_norm"][i])
        for ours, theirs in (("wq", "q_proj"), ("wk", "k_proj"),
                             ("wv", "v_proj"), ("wo", "o_proj")):
            out[lp + f"self_attn.{theirs}.weight"] = _f32(layers["attn"][ours][i]).T
        out[lp + "post_attention_layernorm.weight"] = _f32(layers["post_attn_norm"][i])
        out[lp + "mlp.gate_proj.weight"] = _f32(layers["mlp"]["w_gate"][i]).T
        out[lp + "mlp.up_proj.weight"] = _f32(layers["mlp"]["w_up"][i]).T
        out[lp + "mlp.down_proj.weight"] = _f32(layers["mlp"]["w_down"][i]).T
    out[rp + "norm.weight"] = _f32(params["final_norm"])
    return out


def export_leopard_llava(params: dict, cfg: VLMConfig) -> Dict[str, np.ndarray]:
    """Full VLM params → LlavaForConditionalGeneration state dict (inverse of
    convert_leopard_llava; key layout per
    evaluations/models/llava_multiimg_siglip_anyres.py:179-230)."""
    out = export_siglip_vision(params["vision"], cfg.vision,
                               "vision_tower.vision_model.")
    out.update(export_projector(params["projector"], "multi_modal_projector."))
    out.update(export_decoder(params["text"], cfg.text, "language_model.model."))
    return out


def export_leopard_idefics2(params: dict, cfg: VLMConfig) -> Dict[str, np.ndarray]:
    """Full VLM params → Idefics2ForConditionalGeneration state dict."""
    out = export_siglip_vision(params["vision"], cfg.vision, "model.vision_model.")
    out.update(export_perceiver(params["perceiver"], cfg.perceiver, "model.connector."))
    out.update(export_decoder(params["text"], cfg.text, "model.text_model."))
    return out


def export_vlm(params: dict, cfg: VLMConfig) -> Dict[str, np.ndarray]:
    """Architecture-dispatching full-model export."""
    if cfg.architecture == "leopard_idefics2":
        return export_leopard_idefics2(params, cfg)
    return export_leopard_llava(params, cfg)


# ---------------------------------------------------------------------------
# Loading from disk (safetensors shards or a torch .bin) without network
# ---------------------------------------------------------------------------


def load_hf_state_dict(model_dir: str) -> Dict[str, Array]:
    """Load all weights from an HF model directory (safetensors index, single
    safetensors file, or pytorch_model.bin)."""
    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    single = os.path.join(model_dir, "model.safetensors")
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    sd: Dict[str, Array] = {}
    if os.path.exists(index_path):
        from safetensors import safe_open

        with open(index_path) as f:
            index = json.load(f)
        shards = sorted(set(index["weight_map"].values()))
        for shard in shards:
            with safe_open(os.path.join(model_dir, shard), framework="pt") as fh:
                for key in fh.keys():
                    sd[key] = fh.get_tensor(key)
    elif os.path.exists(single):
        from safetensors import safe_open

        with safe_open(single, framework="pt") as fh:
            for key in fh.keys():
                sd[key] = fh.get_tensor(key)
    elif os.path.exists(bin_path):
        torch = _torch()
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
    else:
        raise FileNotFoundError(f"no weights found under {model_dir}")
    return sd
