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
