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


def pipeline_1f1b(
    layer_fn: Callable,     # (stage_params, x [mb,...], aux_mb) → y [mb,...]
    head_fn: Callable,      # (head_params, y, aux_mb) → (nll_sum, w_sum)
    stage_params,           # pytree, leaves [n_stages, ...] (or [v, n, ...])
    head_params,            # pytree, replicated across stages
    xs: jnp.ndarray,        # [M, mb, ...] stage-0 inputs (microbatch stream)
    aux,                    # pytree, leaves [M, ...] per-microbatch constants
    mesh: Mesh,
    axis: str = "stage",
    seq_axis: str | None = None,   # extra manual axis (CP inside layer_fn)
    xs_spec: P | None = None,      # spec for xs (leading M dim unsharded)
    aux_specs=None,                # pytree of specs matching aux
    v_chunks: int = 1,             # virtual-PP chunks per device (interleaved)
):
    """One-scan SPMD 1F1B pipeline schedule with fused loss head.

    ≙ forward_backward_pipelining_without_interleaving
    (megatron/core/pipeline_parallel/schedules.py:1148) + the P2P transport
    (p2p_communication.py), recast as a single program: stages live on the
    `axis` mesh dimension, activations move up and gradients move down via
    `ppermute` each tick, and the schedule is encoded in tick arithmetic —
    forward of microbatch m at stage s on tick m+s, backward on tick
    m+2(n−1)−s. In steady state every tick does one forward and one backward
    (classic 1F1B interleaving), at most 2(n−1−s)+1 activations are in flight
    per stage (O(n) memory, the whole point of 1F1B vs GPipe), and the
    backward RECOMPUTES the stage forward from a saved-input ring buffer
    (`jax.vjp`), matching the reference's full-recompute training config.

    With `v_chunks = v > 1` the schedule is the INTERLEAVED virtual-PP
    variant (≙ forward_backward_pipelining_with_interleaving,
    schedules.py:431): each device holds v non-contiguous model chunks,
    global stage g = c·n + d, and `stage_params` leaves are [v, n, ...]
    (see split_stages_interleaved). Writing microbatch m = q·n + r, chunk c
    runs its forward on device d at tick q·v·n + c·n + r + d and its backward
    at tick q·v·n + (2v−2−c)·n + r + 2(n−1) − d; the up/down `ppermute`s wrap
    around the ring, which is exactly the chunk c → c+1 (device n−1 → 0)
    hand-off. Total ticks drop from v(M + 2n − 2) to vM + vn + n − 2
    chunk-ticks — the bubble shrinks by ≈(v−1)(n−2) chunk-ticks at the cost
    of v× the in-flight saved inputs, matching Megatron's schedule exactly.
    At v = 1 every formula reduces to the plain 1F1B above.

    The loss head (final norm + CE) runs fused at the last stage's forward
    tick so its gradient seeds the same-tick backward — no extra pipeline
    round-trip for the loss. head_fn returns UNNORMALIZED (nll_sum, w_sum);
    returned grads are d(Σ nll)/dθ, so the caller divides by total w.

    When `seq_axis` is given, layer_fn/head_fn run on sequence-sharded locals
    (attention must use ring_attention_local over seq_axis); per-token-partial
    parameter grads and loss sums are psum'd over it here.

    Returns dict(nll_sum, w_sum, d_stage [n_stages,...] (or [v, n, ...]),
    d_head, d_xs [M, mb, ...]) — all replicated over `axis` except d_stage
    (stage-sharded).
    """
    n = mesh.shape[axis]
    v = v_chunks
    m_total = xs.shape[0]
    # last tick = backward of microbatch M−1 (= q·n + r) at global stage 0:
    # q·v·n + (2v−2)·n + r + 2(n−1); reduces to v·M + v·n + n − 3 when n | M
    q_last, r_last = (m_total - 1) // n, (m_total - 1) % n
    ticks = q_last * v * n + (2 * v - 2) * n + r_last + 2 * (n - 1) + 1
    buf_slots = max(2 * v * n - 1, 1)
    manual = {axis} | ({seq_axis} if seq_axis else set())

    plain = v == 1
    if plain:
        # normalize to the [v, n, ...] leaf contract internally
        stage_params = jax.tree_util.tree_map(lambda p: p[None], stage_params)
    param_specs = jax.tree_util.tree_map(lambda _: P(None, axis), stage_params)
    head_specs = jax.tree_util.tree_map(lambda _: P(), head_params)
    if xs_spec is None:
        xs_spec = P()
    if aux_specs is None:
        aux_specs = jax.tree_util.tree_map(lambda _: P(), aux)

    def body(sp_l, hp, xs_l, aux_l):
        s_idx = jax.lax.axis_index(axis)
        my_params = jax.tree_util.tree_map(lambda p: p[:, 0], sp_l)  # [v, ...]
        is_first = s_idx == 0
        is_last = s_idx == n - 1
        # wrap-around rings: device n−1 → 0 hands the activation to the next
        # chunk (and 0 → n−1 hands the gradient to the previous chunk); at
        # v = 1 the wrapped value is never read (stage 0 pulls the stream,
        # stage n−1 seeds from the fused head)
        up = [(i, (i + 1) % n) for i in range(n)]
        down = [(i, (i - 1) % n) for i in range(n)]
        mb_shape = xs_l.shape[1:]
        f32 = jnp.float32

        def vary(x):
            # scan carries become device-varying after one tick; their inits
            # must carry the same VMA type over every manual axis
            have = set(getattr(jax.typeof(x), "vma", ()))
            for ax in sorted(manual - have):
                x = jax.lax.pcast(x, ax, to="varying")
            return x

        # params must be device-VARYING inside the vjps: for an invariant
        # (replicated) differentiand, AD's transpose auto-psums its cotangent
        # over the manual axes, which would mix other stages' (masked-out)
        # head/layer grads into this stage's accumulator. Varying params keep
        # grads local; the masked accumulation + explicit psums below do the
        # correct reduction.
        my_params = jax.tree_util.tree_map(vary, my_params)
        hp = jax.tree_util.tree_map(vary, hp)

        def dyn(tree, i):
            return jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i, keepdims=False),
                tree,
            )

        def tick(carry, t):
            act, grad, xbuf, dxs, gp, gh, nll, w = carry

            # ---- forward: u = t − d encodes (q, c, r): u = q·v·n + c·n + r,
            # microbatch m_f = q·n + r, chunk c_f on this device ----
            u = t - s_idx
            u0 = jnp.maximum(u, 0)
            uq, ur = u0 // n, u0 % n
            c_f = uq % v
            m_f = (uq // v) * n + ur
            fwd_valid = (u >= 0) & (m_f < m_total)
            mf = jnp.clip(m_f, 0, m_total - 1)
            aux_f = dyn(aux_l, mf)
            params_f = dyn(my_params, c_f)
            x_stream = jax.lax.dynamic_index_in_dim(xs_l, mf, keepdims=False)
            x_in = jnp.where(is_first & (c_f == 0), x_stream, act)
            y = layer_fn(params_f, x_in, aux_f)
            # save this tick's input for the recompute-backward (ring buffer,
            # keyed by u — forwards are dense in t, so u is dense per device)
            slot_f = u0 % buf_slots
            old_slot = jax.lax.dynamic_index_in_dim(xbuf, slot_f, keepdims=False)
            xbuf = jax.lax.dynamic_update_index_in_dim(
                xbuf, jnp.where(fwd_valid, x_in, old_slot), slot_f, axis=0
            )

            # ---- fused head at the last GLOBAL stage (c = v−1, d = n−1),
            # same tick as that stage's backward. Gated with lax.cond so the
            # full-vocab CE forward + vjp (≈ several decoder layers of FLOPs)
            # runs only on the 1/(n·v) of device-ticks that consume it — it
            # used to run unconditionally on every tick of every device, and
            # head_fn contains no collectives so per-device branching is
            # safe (the psums happen after the scan). ----
            def head_wrap(hp_, y_):
                return head_fn(hp_, y_, aux_f)

            head_on = is_last & (c_f == v - 1) & fwd_valid

            def head_true(hp_, y_):
                (nll_mb, w_mb), head_vjp = jax.vjp(head_wrap, hp_, y_)
                # seeds must match the outputs' device-varying (VMA) types
                g_hp, dy_ = head_vjp((nll_mb * 0 + 1, w_mb * 0))
                return nll_mb.astype(f32), w_mb.astype(f32), g_hp, dy_

            def head_false(hp_, y_):
                nll_s, w_s = jax.eval_shape(head_wrap, hp_, y_)
                zeros = (
                    jnp.zeros(nll_s.shape, f32),
                    jnp.zeros(w_s.shape, f32),
                    jax.tree_util.tree_map(
                        lambda p: jnp.zeros(p.shape, p.dtype), hp_
                    ),
                    jnp.zeros_like(y),
                )
                return jax.tree_util.tree_map(vary, zeros)

            nll_mb, w_mb, g_hp, dy = jax.lax.cond(
                head_on, head_true, head_false, hp, y
            )
            nll = nll + nll_mb
            w = w + w_mb
            gh = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(f32), gh, g_hp
            )

            # ---- backward: wb = t − 2(n−1) + d encodes (q, c, r) with the
            # reversed-chunk coefficient: wb = q·v·n + (2v−2−c)·n + r ----
            wb = t - 2 * (n - 1) + s_idx
            wb0 = jnp.maximum(wb, 0)
            wq, wr = wb0 // n, wb0 % n
            c_b = (2 * v - 2 - wq) % v
            q_b = (wq - (2 * v - 2 - c_b)) // v
            m_b = q_b * n + wr
            bwd_valid = (wb >= 0) & (q_b >= 0) & (m_b < m_total)
            mb = jnp.clip(m_b, 0, m_total - 1)
            aux_b = dyn(aux_l, mb)
            params_b = dyn(my_params, c_b)
            u_b = (jnp.maximum(q_b, 0) * v + c_b) * n + wr
            x_saved = jax.lax.dynamic_index_in_dim(
                xbuf, u_b % buf_slots, keepdims=False
            )

            def layer_wrap(p_, x_):
                return layer_fn(p_, x_, aux_b)

            _, layer_vjp = jax.vjp(layer_wrap, params_b, x_saved)
            # at the last global stage m_b == m_f, c_b == v−1, so the head's
            # dy feeds directly into the same-tick backward
            g_in = jnp.where(is_last & (c_b == v - 1), dy, grad)
            g_p, dx = layer_vjp(g_in)
            gp = jax.tree_util.tree_map(
                lambda a, g: jax.lax.dynamic_update_index_in_dim(
                    a,
                    jax.lax.dynamic_index_in_dim(a, c_b, keepdims=False)
                    + jnp.where(bwd_valid, g.astype(f32), 0.0),
                    c_b, axis=0,
                ),
                gp, g_p,
            )
            old_row = jax.lax.dynamic_index_in_dim(dxs, mb, keepdims=False)
            dxs = jax.lax.dynamic_update_index_in_dim(
                dxs,
                jnp.where(is_first & (c_b == 0) & bwd_valid, dx, old_row),
                mb, axis=0,
            )

            # ---- neighbor exchange for the next tick (rings wrap: the
            # n−1 → 0 activation hop is the chunk c → c+1 hand-off, the
            # 0 → n−1 gradient hop is chunk c → c−1) ----
            act_next = jax.lax.ppermute(y, axis, up)
            grad_next = jax.lax.ppermute(dx, axis, down)
            return (act_next, grad_next, xbuf, dxs, gp, gh, nll, w), None

        carry0 = jax.tree_util.tree_map(vary, (
            jnp.zeros(mb_shape, xs_l.dtype),
            jnp.zeros(mb_shape, xs_l.dtype),
            jnp.zeros((buf_slots,) + mb_shape, xs_l.dtype),
            jnp.zeros_like(xs_l),
            jax.tree_util.tree_map(lambda p: jnp.zeros(p.shape, f32), my_params),
            jax.tree_util.tree_map(lambda p: jnp.zeros(p.shape, f32), hp),
            jnp.zeros((), f32),
            jnp.zeros((), f32),
        ))
        carry, _ = jax.lax.scan(tick, carry0, jnp.arange(ticks))
        _, _, _, dxs, gp, gh, nll, w = carry

        # reductions: loss/head/dxs live on single stages → psum over `axis`
        # replicates them; with CP, per-token partials also sum over seq_axis
        red = (axis,) + ((seq_axis,) if seq_axis else ())
        nll = jax.lax.psum(nll, red)
        w = jax.lax.psum(w, red)
        gh = jax.tree_util.tree_map(lambda g: jax.lax.psum(g, red), gh)
        dxs = jax.lax.psum(dxs, axis)
        if seq_axis:
            gp = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, seq_axis), gp
            )
        gp = jax.tree_util.tree_map(lambda g: g[:, None], gp)  # [v, 1, ...]
        return nll, w, gp, gh, dxs

    # d_xs keeps the xs sharding (per-token grads stay sequence-sharded)
    nll, w, d_stage, d_head, d_xs = shard_map(
        body,
        mesh=mesh,
        in_specs=(param_specs, head_specs, xs_spec, aux_specs),
        out_specs=(P(), P(), param_specs, head_specs, xs_spec),
        axis_names=frozenset(manual),
    )(stage_params, head_params, xs, aux)
    if plain:
        d_stage = jax.tree_util.tree_map(lambda g: g[0], d_stage)
    return {
        "nll_sum": nll, "w_sum": w, "d_stage": d_stage, "d_head": d_head,
        "d_xs": d_xs,
    }


def split_stages(stacked_layers, n_stages: int):
    """[L, ...] layer-stacked params → [n_stages, L/n_stages, ...] per leaf
    (the vision-tower ×PP trick at clip_encoder.py:325 becomes a reshape)."""
    def leaf(p):
        l = p.shape[0]
        assert l % n_stages == 0, f"{l} layers not divisible by {n_stages} stages"
        return p.reshape(n_stages, l // n_stages, *p.shape[1:])

    return jax.tree_util.tree_map(leaf, stacked_layers)


def merge_stages(stage_stacked):
    """Inverse of split_stages: [n_stages, L/n_stages, ...] → [L, ...]."""
    return jax.tree_util.tree_map(
        lambda p: p.reshape(p.shape[0] * p.shape[1], *p.shape[2:]), stage_stacked
    )


def split_stages_interleaved(stacked_layers, n_devices: int, v_chunks: int):
    """[L, ...] → [v, n, L/(v·n), ...] per leaf: leaf [c, d] holds the layers
    of GLOBAL stage c·n + d, so each device owns v non-contiguous layer blocks
    (≙ Megatron's interleaved virtual-PP model-chunk assignment,
    schedules.py:431 / transformer_block.py layer offsets)."""
    flat = split_stages(stacked_layers, n_devices * v_chunks)  # [v·n, Lc, ...]
    return jax.tree_util.tree_map(
        lambda p: p.reshape(v_chunks, n_devices, *p.shape[1:]), flat
    )


def merge_stages_interleaved(chunked):
    """Inverse of split_stages_interleaved: [v, n, Lc, ...] → [L, ...]."""
    return jax.tree_util.tree_map(
        lambda p: p.reshape(p.shape[0] * p.shape[1] * p.shape[2], *p.shape[3:]),
        chunked,
    )
