"""Pipeline parallelism: single-program GPipe over a "stage" mesh axis.

TPU-native replacement for the reference's pipeline schedules
(megatron/core/pipeline_parallel/schedules.py — no-pipelining :335, 1F1B
:1148) and its P2P transport (p2p_communication.py). Instead of rank-threaded
send/recv, the whole pipeline is ONE SPMD program: layers are stacked and
sharded over the "stage" axis, microbatches stream through a `lax.scan` whose
per-tick `ppermute` moves activations to the next stage. The schedule is
GPipe (fill–steady–drain) with bubble fraction (n_stages−1)/(M+n_stages−1);
because the loop is a differentiable scan, the backward pass pipelines the
same way in reverse — no hand-written 1F1B bookkeeping.

Microbatch m enters stage 0 at tick m and leaves stage n−1 at tick m+n−1;
idle (bubble) ticks compute on zeros and their writes are masked.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply(
    layer_fn: Callable,            # (stage_params, x [mb, ...]) → x
    stage_params,                  # pytree, leaves [n_stages, ...] (sharded)
    microbatches: jnp.ndarray,     # [M, mb, ...]
    mesh: Mesh,
    axis: str = "stage",
) -> jnp.ndarray:
    """Returns [M, mb, ...] — the last stage's outputs per microbatch."""
    n = mesh.shape[axis]
    m_total = microbatches.shape[0]
    ticks = m_total + n - 1

    param_specs = jax.tree_util.tree_map(lambda _: P(axis), stage_params)
    x_spec = P()           # microbatch stream replicated across stages
    out_spec = P(axis)     # per-stage output buffers stacked; take last stage

    def body(params_local, xs):
        # params_local leaves: [1, ...] (this stage's slice)
        my_params = jax.tree_util.tree_map(lambda p: p[0], params_local)
        s_idx = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n) for i in range(n)]

        def varying(x):
            return jax.lax.pcast(x, axis, to="varying")

        act0 = varying(jnp.zeros_like(xs[0]))
        out0 = varying(jnp.zeros((m_total,) + xs.shape[1:], xs.dtype))

        def tick(carry, t):
            act, out = carry
            # stage 0 pulls microbatch t from the stream; later stages use
            # the activation handed over by the previous stage
            inp_idx = jnp.clip(t, 0, m_total - 1)
            stream_in = jax.lax.dynamic_index_in_dim(xs, inp_idx, keepdims=False)
            x_in = jnp.where(s_idx == 0, varying(stream_in), act)
            y = layer_fn(my_params, x_in)
            # last stage commits microbatch t-(n-1) when it's a real one
            m_out = t - (n - 1)
            valid = (s_idx == n - 1) & (m_out >= 0)
            row = jnp.clip(m_out, 0, m_total - 1)
            prev_row = jax.lax.dynamic_index_in_dim(out, row, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(valid, y, prev_row), row, axis=0
            )
            act = jax.lax.ppermute(y, axis, perm)
            return (act, out), None

        (act, out), _ = jax.lax.scan(tick, (act0, out0), jnp.arange(ticks))
        return out[None]  # [1, M, mb, ...] per stage

    stacked = shard_map(
        body, mesh=mesh, in_specs=(param_specs, x_spec), out_specs=out_spec
    )(stage_params, microbatches)
    return stacked[-1]  # last stage's buffer


def split_stages(stacked_layers, n_stages: int):
    """[L, ...] layer-stacked params → [n_stages, L/n_stages, ...] per leaf
    (the vision-tower ×PP trick at clip_encoder.py:325 becomes a reshape)."""
    def leaf(p):
        l = p.shape[0]
        assert l % n_stages == 0, f"{l} layers not divisible by {n_stages} stages"
        return p.reshape(n_stages, l // n_stages, *p.shape[1:])

    return jax.tree_util.tree_map(leaf, stacked_layers)
