"""Op-level tests: rotary (incl. llama3.1 scaling vs HF), pixel-shuffle vs the
reference permute order (reproduced in numpy), norms, attention masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leopard_tpu.config import TextConfig
from leopard_tpu.ops.attention import attention, make_attention_mask
from leopard_tpu.ops.norms import layer_norm, rms_norm
from leopard_tpu.ops.pixel_shuffle import pixel_shuffle
from leopard_tpu.ops.rotary import apply_rope, compute_inv_freq, rope_cos_sin


# --- rotary ---------------------------------------------------------------


def test_llama31_inv_freq_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    class Cfg:
        rope_theta = 500000.0
        head_dim = 128
        hidden_size = 4096
        num_attention_heads = 32
        partial_rotary_factor = 1.0
        max_position_embeddings = 131072
        rope_scaling = {
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        }

    hf_inv, hf_scale = ROPE_INIT_FUNCTIONS["llama3"](Cfg(), device="cpu")
    ours = compute_inv_freq(TextConfig())
    np.testing.assert_allclose(ours, hf_inv.numpy(), rtol=1e-6)
    assert hf_scale == 1.0


def test_rope_rotation_is_orthogonal():
    cfg = TextConfig(rope_scaling=None, head_dim=64)
    inv = jnp.asarray(compute_inv_freq(cfg))
    pos = jnp.arange(16)[None]
    cos, sin = rope_cos_sin(pos, inv)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 2, 64))
    y = apply_rope(x, cos, sin)
    # norms preserved per (pair) rotation
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )
    # position 0 is identity
    np.testing.assert_allclose(np.asarray(y[:, 0]), np.asarray(x[:, 0]), atol=1e-6)


def test_rope_relative_property():
    """q·k after rope depends only on relative distance."""
    cfg = TextConfig(rope_scaling=None, head_dim=32)
    inv = jnp.asarray(compute_inv_freq(cfg))
    q = jax.random.normal(jax.random.PRNGKey(1), (32,))
    k = jax.random.normal(jax.random.PRNGKey(2), (32,))

    def dot_at(pq, pk):
        cos, sin = rope_cos_sin(jnp.array([[pq, pk]]), inv)
        qk = jnp.stack([q, k])[None, :, None, :]  # [1, 2, 1, 32]
        r = apply_rope(qk, cos, sin)
        return float(jnp.sum(r[0, 0, 0] * r[0, 1, 0]))

    assert abs(dot_at(3, 7) - dot_at(103, 107)) < 1e-3


# --- pixel shuffle ---------------------------------------------------------


def _reference_pixel_shuffle_np(x, r=2):
    """Direct numpy transcription of vlm_model.py:456-466 semantics."""
    b, s, d = x.shape
    side = int(s**0.5)
    x = x.reshape(b, side, side, d)
    x = x.reshape(b, side, side // r, d * r)
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(b, side // r, side // r, d * r * r)
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(b, s // (r * r), d * r * r)


def test_pixel_shuffle_matches_reference_order():
    x = np.random.RandomState(0).randn(2, 26 * 26, 8).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    ref = _reference_pixel_shuffle_np(x, 2)
    assert ours.shape == (2, 169, 32)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_pixel_shuffle_token_count():
    x = jnp.zeros((1, 676, 1152))
    assert pixel_shuffle(x).shape == (1, 169, 4608)


# --- norms ------------------------------------------------------------------


def test_rms_norm_matches_formula():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8)) * 3
    w = jax.random.normal(jax.random.PRNGKey(1), (8,))
    got = rms_norm(x, w, 1e-5)
    xf = np.asarray(x, np.float64)
    want = xf / np.sqrt((xf**2).mean(-1, keepdims=True) + 1e-5) * np.asarray(w)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5)


def test_layer_norm_matches_formula():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8)) * 2 + 1
    w = jnp.ones((8,)) * 1.5
    b = jnp.ones((8,)) * 0.5
    got = layer_norm(x, w, b, 1e-6)
    xf = np.asarray(x, np.float64)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    want = (xf - mu) / np.sqrt(var + 1e-6) * 1.5 + 0.5
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-5)


# --- attention ---------------------------------------------------------------


def _naive_attention(q, k, v, mask):
    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    out = np.zeros_like(q)
    for bi in range(b):
        for h in range(hq):
            kv_h = h // (hq // hkv)
            scores = q[bi, :, h] @ k[bi, :, kv_h].T / np.sqrt(d)
            if mask is not None:
                m = mask[bi if mask.shape[0] > 1 else 0, 0]
                scores = np.where(m, scores, -1e30)
            p = np.exp(scores - scores.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[bi, :, h] = p @ v[bi, :, kv_h]
    return out


def test_attention_gqa_causal():
    rng = np.random.RandomState(0)
    q = rng.randn(2, 6, 4, 8).astype(np.float32)
    k = rng.randn(2, 6, 2, 8).astype(np.float32)
    v = rng.randn(2, 6, 2, 8).astype(np.float32)
    got = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True))
    mask = np.asarray(make_attention_mask(6, 6, causal=True))
    want = _naive_attention(q, k, v, mask)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_attention_segment_ids_block_cross_attention():
    rng = np.random.RandomState(1)
    q = rng.randn(1, 8, 2, 4).astype(np.float32)
    k = rng.randn(1, 8, 2, 4).astype(np.float32)
    v = rng.randn(1, 8, 2, 4).astype(np.float32)
    seg = jnp.array([[1, 1, 1, 2, 2, 2, 0, 0]])
    got = np.asarray(
        attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                  causal=True, q_segment_ids=seg, kv_segment_ids=seg)
    )
    # second segment's first token (pos 3) attends only to itself
    q3 = q[0, 3]
    want_row = v[0, 3]  # single-key softmax = that value
    np.testing.assert_allclose(got[0, 3], np.stack([want_row[0], want_row[1]]), rtol=1e-5)


def test_attention_sliding_window():
    mask = np.asarray(make_attention_mask(6, 6, causal=True, sliding_window=2))
    # token 5 may attend to positions 4,5 only
    assert mask[0, 0, 5].tolist() == [False, False, False, False, True, True]


# --- on-device image preprocessing -------------------------------------------


def test_preprocess_on_device_matches_host():
    from PIL import Image

    from leopard_tpu.data.anyres import preprocess_tiles
    from leopard_tpu.ops.image import center_crop, preprocess_on_device

    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (2, 3, 64, 48), dtype=np.uint8)
    out = np.asarray(preprocess_on_device(jnp.asarray(arr), size=(56, 56)))
    assert out.shape == (2, 3, 56, 56)
    # same normalization convention as the host path
    host_imgs = [
        Image.fromarray(arr[i].transpose(1, 2, 0)) for i in range(2)
    ]
    host = preprocess_tiles(host_imgs, 56)
    # bicubic implementations differ slightly between PIL and jax.image
    assert np.abs(out - host).mean() < 0.1
    # crop: center region preserved exactly
    crop = np.asarray(center_crop(jnp.asarray(arr, jnp.float32), (32, 32)))
    np.testing.assert_array_equal(crop, arr[:, :, 16:48, 8:40].astype(np.float32))


def test_preprocess_on_device_range():
    from leopard_tpu.ops.image import preprocess_on_device

    white = jnp.full((1, 3, 20, 20), 255, jnp.uint8)
    out = np.asarray(preprocess_on_device(white, size=(28, 28)))
    np.testing.assert_allclose(out, 1.0, atol=1e-5)  # (1-0.5)/0.5


def test_encode_images_uint8_matches_fp32():
    """encode_images with raw uint8 NHWC tiles (device-side normalize) ==
    fp32 NCHW tiles normalized on host."""
    import jax

    from leopard_tpu import config as cfgs
    from leopard_tpu.models import vlm

    cfg = cfgs.tiny_vlm()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, size=(2, 56, 56, 3)).astype(np.uint8)
    mean = np.asarray(cfg.anyres.image_mean, np.float32)
    std = np.asarray(cfg.anyres.image_std, np.float32)
    f32 = ((u8.astype(np.float32) / 255.0 - mean) / std).transpose(0, 3, 1, 2)
    a = vlm.encode_images(params, cfg, jnp.asarray(u8))
    b = vlm.encode_images(params, cfg, jnp.asarray(f32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
