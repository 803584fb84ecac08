"""Pipeline parallelism (GPipe shard_map) equivalence + gradient tests."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from leopard_tpu.parallel.pipeline import pipeline_apply, split_stages


def _mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("stage",))


def _mlp_stack(l=8, h=16, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "w": jnp.asarray(rng.randn(l, h, h) * 0.2, jnp.float32),
        "b": jnp.asarray(rng.randn(l, h) * 0.1, jnp.float32),
    }


def _stage_fn(stage_params, x):
    def layer(x, lp):
        return jnp.tanh(x @ lp["w"] + lp["b"]), None

    out, _ = jax.lax.scan(layer, x, stage_params)
    return out


def _sequential(params, x):
    def layer(x, lp):
        return jnp.tanh(x @ lp["w"] + lp["b"]), None

    out, _ = jax.lax.scan(layer, x, params)
    return out


def test_pipeline_matches_sequential():
    mesh = _mesh(4)
    params = _mlp_stack(l=8)
    staged = split_stages(params, 4)
    mb = jnp.asarray(np.random.RandomState(1).randn(6, 2, 16), jnp.float32)

    want = jax.vmap(lambda x: _sequential(params, x))(mb)
    got = pipeline_apply(_stage_fn, staged, mb, mesh, axis="stage")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_pipeline_two_stages():
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("stage",))
    params = _mlp_stack(l=4, seed=2)
    staged = split_stages(params, 2)
    mb = jnp.asarray(np.random.RandomState(3).randn(3, 2, 16), jnp.float32)
    want = jax.vmap(lambda x: _sequential(params, x))(mb)
    got = pipeline_apply(_stage_fn, staged, mb, mesh, axis="stage")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_pipeline_gradients_match_sequential():
    mesh = _mesh(4)
    params = _mlp_stack(l=4, seed=4)
    staged = split_stages(params, 4)
    mb = jnp.asarray(np.random.RandomState(5).randn(4, 2, 16), jnp.float32)

    def loss_pipe(p):
        return jnp.sum(pipeline_apply(_stage_fn, p, mb, mesh) ** 2)

    def loss_seq(p):
        return jnp.sum(jax.vmap(lambda x: _sequential(p, x))(mb) ** 2)

    g_pipe = jax.grad(loss_pipe)(staged)
    g_seq = jax.grad(loss_seq)(params)
    g_seq_staged = split_stages(g_seq, 4)
    for a, b in zip(jax.tree_util.tree_leaves(g_pipe),
                    jax.tree_util.tree_leaves(g_seq_staged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_pipeline_1f1b_interleaved_matches_sequential():
    """Interleaved virtual-PP (v=2 chunks on 4 devices → 8 global stages):
    loss and every gradient match the sequential computation."""
    from leopard_tpu.parallel.pipeline import (
        merge_stages_interleaved,
        pipeline_1f1b,
        split_stages_interleaved,
    )

    n, v = 4, 2
    mesh = _mesh(n)
    params = _mlp_stack(l=8, seed=7)
    staged = split_stages_interleaved(params, n, v)
    m_total, mb, h = 8, 2, 16
    xs = jnp.asarray(np.random.RandomState(8).randn(m_total, mb, h), jnp.float32)
    tgt = jnp.asarray(np.random.RandomState(9).randn(m_total, mb, h), jnp.float32)
    head = {"w": jnp.asarray(np.random.RandomState(10).randn(h, h) * 0.2,
                             jnp.float32)}
    aux = {"t": tgt}

    def layer_fn(sp, x, aux_mb):
        return _stage_fn(sp, x)

    def head_fn(hp, y, aux_mb):
        err = y @ hp["w"] - aux_mb["t"]
        return jnp.sum(err * err), jnp.sum(jnp.ones_like(err))

    res = pipeline_1f1b(
        layer_fn, head_fn, staged, head, xs, aux, mesh,
        axis="stage", v_chunks=v,
    )

    def seq_loss(p, hp, x):
        y = jax.vmap(lambda r: _sequential(p, r))(x)
        err = jnp.einsum("mbh,hk->mbk", y, hp["w"]) - tgt
        return jnp.sum(err * err)

    want = seq_loss(params, head, xs)
    gp_want, gh_want, gx_want = jax.grad(seq_loss, argnums=(0, 1, 2))(
        params, head, xs
    )
    np.testing.assert_allclose(
        float(res["nll_sum"]), float(want), rtol=1e-5
    )
    assert float(res["w_sum"]) == m_total * mb * h
    got_gp = merge_stages_interleaved(res["d_stage"])
    for a, b in zip(jax.tree_util.tree_leaves(got_gp),
                    jax.tree_util.tree_leaves(gp_want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res["d_head"]["w"]),
                               np.asarray(gh_want["w"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res["d_xs"]), np.asarray(gx_want),
                               rtol=1e-4, atol=1e-5)


def test_pipeline_1f1b_interleaved_ragged_microbatches():
    """M not divisible by n: validity masking must keep results exact."""
    from leopard_tpu.parallel.pipeline import (
        merge_stages_interleaved,
        pipeline_1f1b,
        split_stages_interleaved,
    )

    n, v = 2, 3
    mesh = Mesh(np.asarray(jax.devices()[:n]), ("stage",))
    params = _mlp_stack(l=6, seed=11)
    staged = split_stages_interleaved(params, n, v)
    m_total, mb, h = 5, 2, 16
    xs = jnp.asarray(np.random.RandomState(12).randn(m_total, mb, h),
                     jnp.float32)
    tgt = jnp.asarray(np.random.RandomState(13).randn(m_total, mb, h),
                      jnp.float32)
    head = {"w": jnp.eye(h, dtype=jnp.float32)}

    def layer_fn(sp, x, aux_mb):
        return _stage_fn(sp, x)

    def head_fn(hp, y, aux_mb):
        err = y @ hp["w"] - aux_mb["t"]
        return jnp.sum(err * err), jnp.sum(jnp.ones_like(err))

    res = pipeline_1f1b(
        layer_fn, head_fn, staged, head, xs, {"t": tgt}, mesh,
        axis="stage", v_chunks=v,
    )

    def seq_loss(p, x):
        y = jax.vmap(lambda r: _sequential(p, r))(x)
        return jnp.sum((y - tgt) ** 2)

    want = seq_loss(params, xs)
    gp_want = jax.grad(seq_loss)(params, xs)
    np.testing.assert_allclose(float(res["nll_sum"]), float(want), rtol=1e-5)
    got_gp = merge_stages_interleaved(res["d_stage"])
    for a, b in zip(jax.tree_util.tree_leaves(got_gp),
                    jax.tree_util.tree_leaves(gp_want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
