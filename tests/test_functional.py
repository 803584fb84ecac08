"""Functional tests: short-training determinism, golden loss curve, and
checkpoint-resume equivalence.

The counterpart of the reference's functional_tests tier
(tests/functional_tests/python_test_utils/test_ci_pipeline.py compares loss
curves against goldens; test_resume_checkpoint_pipeline.py verifies
checkpoint-resume bit-equivalence). Here the "cluster" is the 8-device CPU
platform and the golden is determinism across runs in-process.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leopard_tpu import config as cfgs
from leopard_tpu.config import OptimizerConfig, TrainConfig
from leopard_tpu.models import vlm
from leopard_tpu.training.trainer import create_train_state, make_train_step


def _setup(steps=6):
    cfg = cfgs.tiny_vlm()
    tcfg = TrainConfig(
        seq_len=16, global_batch_size=2, remat="full",
        optimizer=OptimizerConfig(lr=5e-3, warmup_steps=2, decay_steps=50),
    )
    step = jax.jit(make_train_step(cfg, tcfg))
    return cfg, tcfg, step


def _batches(cfg, n, seed0=100):
    out = []
    for i in range(n):
        rng = np.random.RandomState(seed0 + i)
        ids = rng.randint(1, 100, (2, 16)).astype(np.int32)
        ids[:, 2:6] = cfg.image_token_id
        out.append({
            "tokens": jnp.asarray(ids),
            "loss_weights": jnp.ones((2, 16), jnp.float32),
            "segment_ids": jnp.ones((2, 16), jnp.int32),
            "images": jnp.asarray(rng.randn(2, 3, 56, 56), jnp.float32),
        })
    return out


def _run(cfg, tcfg, step, state, batches):
    losses = []
    for b in batches:
        state, m = step(state, b)
        losses.append(float(m["loss"]))
    return state, losses


def test_training_is_deterministic():
    """Same seed + same data → bit-identical loss curves (the property the
    reference checks against stored goldens)."""
    cfg, tcfg, step = _setup()
    batches = _batches(cfg, 6)
    params = vlm.init_params(cfg, jax.random.PRNGKey(7))
    s1 = create_train_state(params, tcfg)
    s2 = create_train_state(params, tcfg)
    _, l1 = _run(cfg, tcfg, step, s1, batches)
    _, l2 = _run(cfg, tcfg, step, s2, batches)
    assert l1 == l2
    # and the curve actually trains
    assert l2[-1] < l2[0]


def test_resume_matches_uninterrupted(tmp_path):
    """Train 6 steps straight vs train 3 + checkpoint + restore + 3 more:
    parameter-identical (the reference's resume bit-equivalence check)."""
    pytest.importorskip("orbax.checkpoint")
    from leopard_tpu.training.checkpoint import CheckpointManager, abstract_like

    cfg, tcfg, step = _setup()
    batches = _batches(cfg, 6)
    params = vlm.init_params(cfg, jax.random.PRNGKey(3))

    straight = create_train_state(params, tcfg)
    straight, straight_losses = _run(cfg, tcfg, step, straight, batches)

    first = create_train_state(params, tcfg)
    first, first_losses = _run(cfg, tcfg, step, first, batches[:3])
    mgr = CheckpointManager(str(tmp_path / "ck"), async_save=False)
    mgr.save(3, first, data_state={"epoch": 0, "cursor": 3, "seed": 0})
    mgr.wait_until_finished()

    restored, ds = mgr.restore(template=abstract_like(first))
    assert ds["cursor"] == 3
    resumed, resumed_losses = _run(cfg, tcfg, step, restored, batches[3:])
    mgr.close()

    assert first_losses + resumed_losses == straight_losses
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(straight.params)),
        jax.tree_util.tree_leaves(jax.device_get(resumed.params)),
    ):
        np.testing.assert_array_equal(a, b)


def test_golden_loss_first_step():
    """Anchored golden: first-step loss of the fixed tiny setup must stay
    within noise of ln(vocab) — a large drift flags an accidental change to
    init, loss masking, or the forward pass."""
    cfg, tcfg, step = _setup()
    params = vlm.init_params(cfg, jax.random.PRNGKey(7))
    state = create_train_state(params, tcfg)
    _, m = step(state, _batches(cfg, 1)[0])
    loss = float(m["loss"])
    expected = np.log(cfg.text.vocab_size)  # ≈ 6.24 for vocab 512
    assert abs(loss - expected) < 1.0, (loss, expected)


def test_batch_ramp_schedule():
    """BatchRamp follows Megatron --rampup-batch-size semantics: equal sample
    intervals per increment (megatron_patch/training.py:564-575)."""
    from leopard_tpu.training.loop import BatchRamp

    ramp = BatchRamp(4, 2, 12, global_batch_size=8)
    # (8-4)/2 = 2 increments; 12/2 = 6 samples each
    assert [ramp.batch_size(s) for s in (0, 5, 6, 11, 12, 100)] == [4, 4, 6, 6, 8, 8]
    # no ramp span → always full size
    assert BatchRamp(8, 2, 12, global_batch_size=8).batch_size(0) == 8


def test_train_loop_with_rampup():
    """train() with rampup_batch_size asks the provider for growing batch
    sizes and completes (each size compiles its own step program)."""
    from leopard_tpu.training.loop import train

    cfg = cfgs.tiny_vlm()
    tcfg = TrainConfig(
        seq_len=16, global_batch_size=4, train_steps=4, log_interval=1000,
        eval_interval=0, save_interval=0, remat="full",
        rampup_batch_size=(2, 2, 4),
        optimizer=OptimizerConfig(lr=5e-3, warmup_steps=2, decay_steps=50),
    )
    step = jax.jit(make_train_step(cfg, tcfg))
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    state = create_train_state(params, tcfg)
    requested = []

    def provider(bs):
        requested.append(bs)
        rng = np.random.RandomState(len(requested))
        ids = rng.randint(1, 100, (bs, 16)).astype(np.int32)
        return {
            "tokens": jnp.asarray(ids),
            "loss_weights": jnp.ones((bs, 16), jnp.float32),
            "segment_ids": jnp.ones((bs, 16), jnp.int32),
        }

    state = train(cfg, tcfg, state, step, provider)
    # ramp: (4-2)/2 = 1 increment over 4 samples → steps at bs 2,2,4,4
    assert requested == [2, 2, 4, 4]
    assert int(state.step) == 4


def test_batch_ramp_resume_continues_schedule():
    """Resuming from a checkpointed step must continue the ramp where it
    left off, not restart from the smallest batch (round-2 review finding:
    consumed_samples was reset to 0 on resume)."""
    from leopard_tpu.training.loop import BatchRamp

    ramp = BatchRamp(4, 2, 12, global_batch_size=8)
    # replay: steps consume 4,4 (8 total ≥ 6 → size 6), 6 (14 ≥ 12 → 8), 8...
    consumed = 0
    sizes = []
    for _ in range(5):
        bs = ramp.batch_size(consumed)
        sizes.append(bs)
        consumed += bs
    for step in range(6):
        got = ramp.consumed_samples_at(step)
        want = sum(sizes[:step]) if step <= 5 else None
        assert got == want, (step, got, want)
    # after full ramp, batch size at the reconstructed consumption is stable
    assert ramp.batch_size(ramp.consumed_samples_at(5)) == 8
