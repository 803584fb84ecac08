"""Pallas fused norm kernels vs jnp references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from leopard_tpu.ops.norms import layer_norm, rms_norm
from leopard_tpu.ops.pallas.norms import fused_layer_norm, fused_rms_norm


@pytest.fixture
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_fused_rms_matches(interpret_mode):
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 32)) * 3
    w = jax.random.normal(jax.random.PRNGKey(1), (32,))
    got = fused_rms_norm(x, w, 1e-5)
    want = rms_norm(x, w, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_fused_layer_norm_matches(interpret_mode):
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 32)) * 2 + 1
    w = jnp.ones((32,)) * 1.3
    b = jnp.ones((32,)) * 0.2
    got = fused_layer_norm(x, w, b, 1e-6)
    want = layer_norm(x, w, b, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_fused_rms_gradients(interpret_mode):
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 16))
    w = jax.random.normal(jax.random.PRNGKey(4), (16,))

    g_fused = jax.grad(lambda x, w: jnp.sum(fused_rms_norm(x, w, 1e-5) ** 2),
                       argnums=(0, 1))(x, w)
    g_ref = jax.grad(lambda x, w: jnp.sum(rms_norm(x, w, 1e-5) ** 2),
                     argnums=(0, 1))(x, w)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
