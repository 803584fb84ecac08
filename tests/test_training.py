"""Training step, optimizer, checkpointing, and loop tests (tiny configs)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leopard_tpu import config as cfgs
from leopard_tpu.config import OptimizerConfig, TrainConfig
from leopard_tpu.models import vlm
from leopard_tpu.training.trainer import (
    TrainState,
    cast_for_compute,
    create_train_state,
    make_train_step,
    token_cross_entropy,
    vlm_loss,
)


def _setup(remat="none"):
    cfg = cfgs.tiny_vlm()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(
        seq_len=16, global_batch_size=2, remat=remat,
        optimizer=OptimizerConfig(lr=1e-2, warmup_steps=1, decay_steps=100),
    )
    state = create_train_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg))
    return cfg, tcfg, state, step


def _batch(cfg, b=2, s=16, with_images=True, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(1, 100, (b, s)).astype(np.int32)
    images = None
    if with_images:
        ids[:, 2:6] = cfg.image_token_id
        images = jnp.asarray(rng.randn(b, 3, 56, 56), jnp.float32)
    batch = {
        "tokens": jnp.asarray(ids),
        "loss_weights": jnp.ones((b, s), jnp.float32),
        "segment_ids": jnp.ones((b, s), jnp.int32),
    }
    if images is not None:
        batch["images"] = images
    return batch


def test_token_cross_entropy_matches_manual():
    logits = jnp.asarray(np.random.RandomState(0).randn(1, 4, 8), jnp.float32)
    targets = jnp.asarray([[1, 3, 5, 7]], jnp.int32)
    weights = jnp.asarray([[1.0, 0.0, 1.0, 1.0]])
    loss, tw = token_cross_entropy(logits, targets, weights)
    lp = jax.nn.log_softmax(logits, -1)
    manual = -(lp[0, 0, 1] + lp[0, 2, 5] + lp[0, 3, 7]) / 3
    np.testing.assert_allclose(float(loss), float(manual), rtol=1e-5)
    assert float(tw) == 3.0


def test_train_step_reduces_loss():
    cfg, tcfg, state, step = _setup()
    batch = _batch(cfg)
    losses = []
    for _ in range(10):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    assert int(state.step) == 10


def test_train_step_remat_matches_no_remat():
    cfg, tcfg, state, step = _setup("none")
    _, _, state_r, step_r = _setup("full")
    batch = _batch(cfg)
    s1, m1 = step(state, batch)
    s2, m2 = step_r(state_r, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )


def test_train_step_selective_remat_matches_no_remat():
    """remat='selective' (save GEMM + attention outputs, recompute the rest;
    ≙ Megatron --recompute-granularity selective) must be a pure memory/time
    tradeoff: same loss and gradients as remat='none'."""
    cfg, tcfg, state, step = _setup("none")
    _, _, state_s, step_s = _setup("selective")
    batch = _batch(cfg)
    _, m1 = step(state, batch)
    _, m2 = step_s(state_s, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )


def test_frozen_groups_dont_update():
    cfg = cfgs.tiny_vlm()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(
        seq_len=16, global_batch_size=2,
        optimizer=OptimizerConfig(lr=1e-2, warmup_steps=1, decay_steps=100),
        remat="none",
    )
    state = create_train_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, frozen=("vision",)))
    before = jax.device_get(state.params["vision"])
    state, _ = step(state, _batch(cfg))  # step 0 has lr=0 (warmup)
    state, _ = step(state, _batch(cfg))
    after = jax.device_get(state.params["vision"])
    for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)
    # text params did move
    moved = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda a, b: np.abs(a - b).max(),
            jax.device_get(params["text"]), jax.device_get(state.params["text"]),
        )
    )
    assert max(float(m) for m in moved) > 0


def test_loss_ignores_image_and_pad_targets():
    cfg = cfgs.tiny_vlm()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    b = _batch(cfg, with_images=True)
    # weight everything; vlm_loss must still exclude image-token targets + pads
    seg = np.ones((2, 16), np.int32)
    seg[:, -4:] = 0
    b["segment_ids"] = jnp.asarray(seg)
    loss, aux = vlm_loss(params, cfg, b, jnp.float32, remat=False)
    # 15 shifted targets; minus 4 image-token targets (positions 2..5 of
    # target stream = ids[1:] indices 1..4) minus 4 pad targets... count:
    ids = np.asarray(b["tokens"])
    targets = ids[:, 1:]
    valid = (targets != cfg.image_token_id) & (seg[:, 1:] != 0)
    assert float(aux["tokens_in_loss"]) == float(valid.sum())


def test_nan_step_skips_update():
    cfg, tcfg, state, step = _setup()
    batch = _batch(cfg)
    bad = dict(batch)
    bad["loss_weights"] = batch["loss_weights"] * jnp.float32(np.nan)
    before = jax.device_get(state.params["text"]["final_norm"])
    state2, metrics = step(state, bad)
    assert bool(metrics["nan_step"])
    after = jax.device_get(state2.params["text"]["final_norm"])
    np.testing.assert_array_equal(before, after)


def test_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from leopard_tpu.training.checkpoint import CheckpointManager, abstract_like

    cfg, tcfg, state, step = _setup()
    state, _ = step(state, _batch(cfg))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
    mgr.save(1, state, data_state={"epoch": 0, "cursor": 42, "seed": 1})
    mgr.wait_until_finished()
    assert mgr.latest_step() == 1

    template = abstract_like(state)
    restored, data_state = mgr.restore(template=template)
    assert data_state["cursor"] == 42
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.params)),
        jax.tree_util.tree_leaves(jax.device_get(restored.params)),
    ):
        np.testing.assert_array_equal(a, b)
    mgr.close()


def test_train_loop_smoke(tmp_path):
    from leopard_tpu.training.loop import train
    from leopard_tpu.utils.timers import MetricsLogger

    cfg, tcfg, state, step = _setup()
    import dataclasses

    tcfg = dataclasses.replace(tcfg, train_steps=3, log_interval=1,
                               save_interval=0, eval_interval=0)
    batches = iter([_batch(cfg, seed=i) for i in range(5)])
    logger = MetricsLogger(str(tmp_path))
    final = train(cfg, tcfg, state, step, batches, logger=logger)
    assert int(final.step) == 3
    logger.close()
    with open(os.path.join(tmp_path, "metrics.jsonl")) as f:
        rows = f.readlines()
    assert len(rows) == 3


def test_grad_accumulation_matches_full_batch():
    """accum=2 over a 4-row text batch == single 4-row step (same grads →
    same updated params)."""
    import dataclasses

    cfg = cfgs.tiny_vlm()
    tcfg = TrainConfig(
        seq_len=16, global_batch_size=4, remat="none",
        optimizer=OptimizerConfig(lr=1e-2, warmup_steps=0, decay_steps=100,
                                  grad_clip=0.0),
    )
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg, b=4, with_images=False, seed=7)

    s1 = create_train_state(params, tcfg)
    step_full = jax.jit(make_train_step(cfg, tcfg))
    s1, m1 = step_full(s1, batch)

    s2 = create_train_state(params, tcfg)
    step_accum = jax.jit(make_train_step(cfg, tcfg, grad_accum_steps=2))
    s2, m2 = step_accum(s2, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )
    # Adam normalizes by |g|, so fp32 reorder noise between the scanned and
    # batched reductions is amplified near g≈0 — compare params at the scale
    # of the update (lr=1e-2), not machine epsilon
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s1.params)),
        jax.tree_util.tree_leaves(jax.device_get(s2.params)),
    ):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=0)


def test_grad_accumulation_ragged_tokens_and_tiles():
    """Regression (round-1 ADVICE/VERDICT Weak #9): grad accumulation with
    ragged valid-token counts (answer_loss_only) and ragged image-tile counts
    per microbatch must equal the single big-batch step — microbatches are
    weighted by their token counts, and per-microbatch tile stacks may carry
    harmless padding tiles."""
    cfg = cfgs.tiny_vlm()
    # large Adam eps keeps step-1 updates ∝ g (plain Adam normalizes to ±lr,
    # amplifying fp32 reorder noise on near-zero grads into full-size updates)
    tcfg = TrainConfig(
        seq_len=16, global_batch_size=4, remat="none",
        optimizer=OptimizerConfig(lr=1e-2, warmup_steps=0, decay_steps=100,
                                  grad_clip=0.0, eps=1.0),
    )
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))

    rng = np.random.RandomState(13)
    b, s = 4, 16
    ids = rng.randint(1, 100, (b, s)).astype(np.int32)
    # rows 0, 2, 3 carry one 4-token tile each; row 1 is text-only
    for r in (0, 2, 3):
        ids[r, 2:6] = cfg.image_token_id
    tiles = rng.randn(3, 3, 56, 56).astype(np.float32)
    # ragged answer-only loss masks
    w = np.zeros((b, s), np.float32)
    w[0, 6:] = 1.0
    w[1, 3:8] = 1.0
    w[2, 8:] = 1.0
    w[3, 1:] = 1.0

    full_batch = {
        "tokens": jnp.asarray(ids),
        "loss_weights": jnp.asarray(w),
        "segment_ids": jnp.ones((b, s), jnp.int32),
        "images": jnp.asarray(tiles),
    }
    s1 = create_train_state(params, tcfg)
    s1, m1 = jax.jit(make_train_step(cfg, tcfg))(s1, full_batch)

    # microbatch 0 = rows 0-1 (1 real tile + 1 padding tile), mb 1 = rows 2-3
    stacked = np.zeros((2, 2, 3, 56, 56), np.float32)
    stacked[0, 0] = tiles[0]
    stacked[1, 0] = tiles[1]
    stacked[1, 1] = tiles[2]
    accum_batch = dict(full_batch, images=jnp.asarray(stacked))
    s2 = create_train_state(params, tcfg)
    s2, m2 = jax.jit(make_train_step(cfg, tcfg, grad_accum_steps=2))(s2, accum_batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )
    for a, bb in zip(
        jax.tree_util.tree_leaves(jax.device_get(s1.params)),
        jax.tree_util.tree_leaves(jax.device_get(s2.params)),
    ):
        np.testing.assert_allclose(a, bb, atol=5e-4, rtol=0)


def test_weight_decay_skips_norms():
    import optax

    from leopard_tpu.training.trainer import _decay_mask

    cfg = cfgs.tiny_vlm()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    mask = _decay_mask(params["text"])
    assert bool(mask["layers"]["attn"]["wq"])
    assert not bool(mask["layers"]["input_norm"])
    assert not bool(mask["final_norm"])


def test_chunked_ce_matches_dense():
    from leopard_tpu.training.trainer import chunked_cross_entropy

    rng = np.random.RandomState(11)
    hidden = jnp.asarray(rng.randn(2, 12, 16), jnp.float32)
    unembed = jnp.asarray(rng.randn(16, 40), jnp.float32)
    targets = jnp.asarray(rng.randint(0, 40, (2, 12)), jnp.int32)
    weights = jnp.asarray((rng.rand(2, 12) > 0.3).astype(np.float32))

    logits = hidden @ unembed
    want, want_w = token_cross_entropy(logits, targets, weights)
    got, got_w = chunked_cross_entropy(hidden, unembed, targets, weights, chunk=5)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    assert float(got_w) == float(want_w)

    # gradients too (remat inside the scan)
    def loss_dense(h, u):
        return token_cross_entropy(h @ u, targets, weights)[0]

    def loss_chunked(h, u):
        return chunked_cross_entropy(h, u, targets, weights, chunk=4)[0]

    gd = jax.grad(loss_dense, argnums=(0, 1))(hidden, unembed)
    gc = jax.grad(loss_chunked, argnums=(0, 1))(hidden, unembed)
    for a, b in zip(gd, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_chunked_ce_prime_length_keeps_chunk():
    """r5 regression: S is padded to a chunk multiple instead of shrinking
    the chunk to a divisor of S. The old divisor search degenerated to
    chunk=1 when S was prime — and S is ALWAYS seq_len-1 (next-token
    shift), so seq 8192 → S=8191 (prime) ran an 8191-iteration scan of
    vector-vocab matmuls: 9.7 s/step vs 0.6 at the 0.836B profile."""
    from leopard_tpu.training.trainer import chunked_cross_entropy

    rng = np.random.RandomState(12)
    b, s, h, v = 2, 127, 16, 40            # s PRIME
    hidden = jnp.asarray(rng.randn(b, s, h), jnp.float32)
    unembed = jnp.asarray(rng.randn(h, v), jnp.float32)
    targets = jnp.asarray(rng.randint(0, v, (b, s)), jnp.int32)
    weights = jnp.asarray((rng.rand(b, s) > 0.3).astype(np.float32))

    want, want_w = token_cross_entropy(hidden @ unembed, targets, weights)
    got, got_w = chunked_cross_entropy(hidden, unembed, targets, weights,
                                       chunk=32)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    assert float(got_w) == float(want_w)

    # the scan must run ceil(127/32)=4 chunks, not 127 single columns
    jaxpr = jax.make_jaxpr(
        lambda h, u: chunked_cross_entropy(h, u, targets, weights, chunk=32)
    )(hidden, unembed)
    scans = [e for e in jaxpr.eqns if e.primitive.name == "scan"]
    assert scans and scans[0].params["length"] == 4, scans


def test_train_step_mixed_remat_matches_no_remat():
    """MIXED policy (remat='selective' on the decoder, remat_vision='full' on
    the tower — the 16k memory/speed point, VERDICT r2 next #5) is a pure
    memory/time tradeoff: same loss and gradients as remat='none'."""
    import dataclasses

    cfg, _, state, step = _setup("none")
    tcfg = TrainConfig(
        seq_len=16, global_batch_size=2, remat="selective",
        remat_vision="full",
        optimizer=OptimizerConfig(lr=1e-2, warmup_steps=1, decay_steps=100),
    )
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    state_m = create_train_state(params, tcfg)
    step_m = jax.jit(make_train_step(cfg, tcfg))
    batch = _batch(cfg)
    _, m1 = step(state, batch)
    _, m2 = step_m(state_m, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )


def test_train_step_attn_remat_matches_no_remat():
    """remat='attn' (save ONLY attention outputs — the 16k+ memory point
    where 'selective' does not fit but re-running flash in the backward is
    the dominant recompute) is a pure memory/time tradeoff: same loss and
    gradients as remat='none'."""
    cfg, tcfg, state, step = _setup("none")
    _, _, state_a, step_a = _setup("attn")
    batch = _batch(cfg)
    _, m1 = step(state, batch)
    _, m2 = step_a(state_a, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )
