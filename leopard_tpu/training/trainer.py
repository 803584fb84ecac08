"""Training step: loss, optimizer, LR schedule, sharded train state.

TPU-native replacement for the reference's train_step
(megatron_patch/training.py:204-263) + DistributedOptimizer
(megatron/core/optimizer/distrib_optimizer.py:45) + grad clipping
(megatron/core/optimizer/clip_grads.py):

  - fp32 master params live in the train state; forward casts to bf16
    (≙ Megatron bf16-with-fp32-main-params), so optimizer math is exact.
  - DP gradient reduction, TP activation collectives, and optimizer-state
    sharding all come from jit over the mesh: grads inherit param shardings
    (ZeRO-style when fsdp axis > 1), no hand-written reduce-scatter.
  - loss = token cross-entropy weighted by per-token loss weights
    (≙ the `weights` stream of mm_pretrain_dataset.py:841-854 and
    `--answer-loss-only`), averaged over valid tokens globally.
  - remat ≙ full recompute; grad-norm clip ≙ clip_grads.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from leopard_tpu.config import OptimizerConfig, TrainConfig, VLMConfig
from leopard_tpu.models import vlm


@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray          # scalar int32
    params: Any                # fp32 master params
    opt_state: Any

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


jax.tree_util.register_dataclass(
    TrainState, data_fields=["step", "params", "opt_state"], meta_fields=[]
)


def lr_schedule(cfg: OptimizerConfig):
    if cfg.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.lr,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.decay_steps, cfg.warmup_steps + 1),
            end_value=cfg.min_lr,
        )
    if cfg.schedule == "linear":
        return optax.warmup_constant_schedule(0.0, cfg.lr, cfg.warmup_steps)
    return lambda step: cfg.lr


def _decay_mask(params):
    """Weight decay only on matrix weights — norm scales, biases, and other
    vector params are exempt (Megatron's get_param_groups wd_mult=0 for
    norms/biases). Layer-stacked params carry a leading layer axis, so the
    check is path-based (norm/bias names) plus effective rank."""
    import re

    from leopard_tpu.parallel.sharding import path_str

    def leaf(path, p):
        name = path_str(path)
        if re.search(r"(norm|(^|/)b[a-z0-9]?$|bias|latents)", name):
            return False
        # effective rank: ignore a leading layer-stack axis
        eff = p.ndim - (1 if "layers" in name else 0)
        return eff >= 2

    return jax.tree_util.tree_map_with_path(leaf, params)


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    chain = []
    if cfg.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    chain.append(
        optax.adamw(
            learning_rate=lr_schedule(cfg),
            b1=cfg.beta1,
            b2=cfg.beta2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            mask=_decay_mask if cfg.weight_decay > 0 else None,
        )
    )
    return optax.chain(*chain)


def create_train_state(params, cfg: TrainConfig, frozen_mask=None) -> TrainState:
    """params are upcast to fp32 master copies."""
    fp32 = jax.tree_util.tree_map(lambda p: p.astype(jnp.float32), params)
    tx = make_optimizer(cfg.optimizer)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=fp32, opt_state=tx.init(fp32)
    )


def cast_for_compute(params, dtype=jnp.bfloat16):
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, params
    )


def token_cross_entropy(
    logits: jnp.ndarray,        # [B, S, V] fp32 (already shifted: predicts t+1)
    targets: jnp.ndarray,       # [B, S] int32
    weights: jnp.ndarray,       # [B, S] float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (weighted mean loss, total weight)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(
        logits, targets[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    # weight-0 targets may be out-of-vocab sentinels (image token); their
    # gather fills NaN, which 0-weight multiply would still propagate
    nll = jnp.where(weights > 0, logz - true_logit, 0.0)
    total_w = jnp.maximum(jnp.sum(weights), 1e-8)
    return jnp.sum(nll * weights) / total_w, total_w


def chunked_cross_entropy(
    hidden: jnp.ndarray,       # [B, S, H] — pre-unembedding hidden states
    unembed: jnp.ndarray,      # [H, V]
    targets: jnp.ndarray,      # [B, S]
    weights: jnp.ndarray,      # [B, S]
    chunk: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-entropy without materializing [B, S, V] logits: scan over
    sequence chunks, computing the chunk's logits + NLL and discarding them.
    Peak memory O(B·chunk·V); each chunk body is rematerialized so the
    backward recomputes its logits instead of saving them (the role the
    reference's vocab-parallel fused CE plays,
    megatron/core/tensor_parallel/cross_entropy.py:14).

    S is PADDED up to a chunk multiple with zero-weight positions rather
    than shrinking the chunk to a divisor of S. The old divisor search was
    a trap: the caller passes seq_len-1 (next-token shift), and e.g.
    8192-1 = 8191 is PRIME — the chunk silently degenerated to 1 and the
    scan became 8191 vector-vocab matmuls that XLA lowers as kLoop fusions
    (measured 9.7 s/step vs 0.6 s at the 0.836B/seq-8192 profile, r5);
    16384-1 = 16383 quietly gave chunk 381. Zero weights keep the padded
    rows out of the loss exactly (the wx > 0 guard)."""
    b, s, h = hidden.shape
    chunk = min(chunk, s)
    pad = (-s) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)))
        weights = jnp.pad(weights, ((0, 0), (0, pad)))
        s += pad
    n = s // chunk
    hc = hidden.reshape(b, n, chunk, h).transpose(1, 0, 2, 3)
    tc = targets.reshape(b, n, chunk).transpose(1, 0, 2)
    wc = weights.reshape(b, n, chunk).transpose(1, 0, 2)

    @partial(jax.checkpoint, prevent_cse=False)
    def body(carry, xs):
        nll_sum, w_sum = carry
        hx, tx, wx = xs
        logits = (hx.astype(jnp.float32) @ unembed.astype(jnp.float32))
        logz = jax.nn.logsumexp(logits, axis=-1)
        true_logit = jnp.take_along_axis(
            logits, tx[..., None].astype(jnp.int32), axis=-1
        )[..., 0]
        # see token_cross_entropy: guard NaN fills from weight-0 OOB targets
        nll = jnp.where(wx > 0, logz - true_logit, 0.0) * wx
        return (nll_sum + jnp.sum(nll), w_sum + jnp.sum(wx)), None

    # tie the carry init's device-varying (VMA) type to the inputs' so this
    # works unchanged inside shard_map regions (e.g. the 1F1B pipeline head)
    zero = (
        jnp.zeros(())
        + 0.0 * hidden.ravel()[0].astype(jnp.float32)
        + 0.0 * weights.ravel()[0]
        + 0.0 * targets.ravel()[0].astype(jnp.float32)
    )
    (nll_sum, w_sum), _ = jax.lax.scan(body, (zero, zero), (hc, tc, wc))
    total_w = jnp.maximum(w_sum, 1e-8)
    return nll_sum / total_w, total_w


def vlm_loss(
    params,
    cfg: VLMConfig,
    batch: dict,
    compute_dtype=jnp.bfloat16,
    remat: bool = True,
    loss_chunk: int = 1024,
    cp_mesh=None,
    cp_axis: str = "seq",
    remat_vision=None,
):
    """batch: tokens [B,S], loss_weights [B,S], segment_ids [B,S],
    optional images [N,3,H,W] (+patch_mask), optional positions.

    Next-token prediction: logits[:, t] predicts tokens[:, t+1]; image-token
    and padding positions carry weight 0 (≙ loss masking in
    examples/llava/pretrain_megatron_llava.py:101-121). The unembedding +
    cross-entropy run chunked over the sequence so [B,S,V] logits are never
    materialized."""
    p = cast_for_compute(params, compute_dtype)
    moe = cfg.text.num_experts > 0
    out = vlm.forward(
        p, cfg,
        batch["tokens"],
        images=batch.get("images"),
        patch_mask=batch.get("patch_mask"),
        positions=batch.get("positions"),
        segment_ids=batch.get("segment_ids"),
        remat=remat,
        remat_vision=remat_vision,
        return_aux=moe,
        return_hidden=True,
        cp_mesh=cp_mesh,
        cp_axis=cp_axis,
    )
    hidden = out[0]
    moe_aux = out[2] if moe else None
    targets = batch["tokens"][:, 1:]
    weights = batch["loss_weights"][:, 1:].astype(jnp.float32)
    # never train on image-token or padding targets
    weights = weights * (targets != cfg.image_token_id)
    if "segment_ids" in batch and batch["segment_ids"] is not None:
        weights = weights * (batch["segment_ids"][:, 1:] != 0)
    text_p = p["text"]
    unembed = (
        text_p["embed_tokens"].T if cfg.text.tie_word_embeddings else text_p["lm_head"]
    )
    loss, total_w = chunked_cross_entropy(
        hidden[:, :-1], unembed, targets, weights, chunk=loss_chunk
    )
    metrics = {"loss": loss, "tokens_in_loss": total_w}
    if moe_aux is not None:
        loss = loss + moe_aux["aux_loss"] + moe_aux["z_loss"]
        metrics["moe_aux_loss"] = moe_aux["aux_loss"]
        metrics["moe_z_loss"] = moe_aux["z_loss"]
        metrics["moe_fraction_dropped"] = moe_aux["fraction_dropped"]
    return loss, metrics


def make_train_step(cfg: VLMConfig, train_cfg: TrainConfig, frozen=(),
                    grad_accum_steps: int = 1, cp_mesh=None, cp_axis: str = "seq"):
    """Returns train_step(state, batch) → (state, metrics); jit it with the
    caller's shardings. `frozen` names top-level param groups to freeze
    (≙ --freeze-clip-vision-tower / --freeze-llm / --freeze-perceiver,
    megatron_patch/arguments.py:236-244). `grad_accum_steps` > 1 splits the
    batch's leading dim into microbatches and accumulates gradients under a
    lax.scan (≙ the micro/global-batch split of train_step,
    megatron_patch/training.py:204; peak activation memory is one
    microbatch). `cp_mesh` routes decoder attention through the ring kernel
    over `cp_axis` when cfg.text.attn_impl == "ring" (context-parallel
    training, ≙ the TE CP wiring at custom_layers/transformer_engine.py:444)."""
    tx = make_optimizer(train_cfg.optimizer)
    # "none" | "selective" | "full" — threaded through vlm_loss into the
    # decoder/vision layer scans (ops/remat.py)
    remat = False if train_cfg.remat == "none" else train_cfg.remat
    remat_vision = train_cfg.remat_vision  # None = follow `remat` (mixed policy)
    compute_dtype = jnp.dtype(cfg.text.dtype)
    if cfg.text.attn_impl != "ring":
        cp_mesh = None

    def train_step(state: TrainState, batch: dict):
        def loss_fn(params, mb):
            return vlm_loss(params, cfg, mb, compute_dtype, remat,
                            loss_chunk=train_cfg.loss_chunk,
                            cp_mesh=cp_mesh, cp_axis=cp_axis,
                            remat_vision=remat_vision)

        if grad_accum_steps <= 1:
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch
            )
        else:
            # token-stream arrays split on the leading batch dim; images and
            # patch_mask (tile-leading, ragged across rows) must already be
            # stacked per microbatch [A, T, ...] so each microbatch's splice
            # sees exactly its own tiles
            def split(v):
                b = v.shape[0]
                assert b % grad_accum_steps == 0, (
                    f"batch {b} not divisible by grad_accum_steps={grad_accum_steps}"
                )
                return v.reshape(grad_accum_steps, b // grad_accum_steps, *v.shape[1:])

            prestacked = ("images", "patch_mask")
            micro = {
                k: (v if k in prestacked else split(v)) for k, v in batch.items()
            }
            if "images" in micro:
                assert micro["images"].ndim == 5 and (
                    micro["images"].shape[0] == grad_accum_steps
                ), "with grad accumulation, pass images as [accum, tiles, 3, H, W]"
            if micro.get("patch_mask") is not None:
                assert micro["patch_mask"].shape[0] == grad_accum_steps, (
                    "with grad accumulation, pass patch_mask pre-stacked "
                    "[accum, tiles, ...] to match images"
                )

            # weight each microbatch by its valid-token count so the result
            # equals a single big batch averaged over valid tokens globally
            # (answer_loss_only makes counts ragged across microbatches)
            def accum(carry, mb):
                g_acc, nll_acc, tw_acc = carry
                (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, mb
                )
                w = aux["tokens_in_loss"]
                g_acc = jax.tree_util.tree_map(
                    lambda a, gi: a + gi * w, g_acc, g
                )
                return (g_acc, nll_acc + l * w, tw_acc + w), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, nll_sum, tw), _ = jax.lax.scan(
                accum, (zeros, jnp.zeros(()), jnp.zeros(())), micro
            )
            inv = 1.0 / jnp.maximum(tw, 1e-8)
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            loss = nll_sum * inv
            metrics = {"loss": loss, "tokens_in_loss": tw}
        return apply_gradients(tx, state, grads, loss, metrics, frozen=frozen)

    return train_step


def apply_gradients(tx, state: TrainState, grads, loss, metrics, frozen=()):
    """Freeze-mask, clip+adamw update, NaN-step skip — the shared tail of
    every train step (≙ optimizer.step + NaN-iteration accounting,
    megatron_patch/training.py:242-244,325-337)."""
    if frozen:
        grads = {
            k: (jax.tree_util.tree_map(jnp.zeros_like, v) if k in frozen else v)
            for k, v in grads.items()
        }
    gnorm = optax.global_norm(grads)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics = dict(metrics)
    metrics["grad_norm"] = gnorm
    metrics["nan_step"] = jnp.logical_not(jnp.isfinite(loss))
    # skip the update entirely on NaN/inf loss (≙ NaN-iteration
    # accounting, megatron_patch/training.py:325-337)
    keep = jnp.isfinite(loss) & jnp.isfinite(gnorm)
    new_params = jax.tree_util.tree_map(
        lambda new, old: jnp.where(keep, new, old), new_params, state.params
    )
    new_opt = jax.tree_util.tree_map(
        lambda new, old: jnp.where(keep, new, old) if hasattr(new, "shape") else new,
        new_opt, state.opt_state,
    )
    return state.replace(
        step=state.step + 1, params=new_params, opt_state=new_opt
    ), metrics
