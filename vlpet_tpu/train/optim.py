"""Optimizer + schedule.

Reference: src/trainer_base.py:627-732 — AdamW with no-decay groups (params
whose name contains 'bias' or is a LayerNorm weight), linear warmup from
warmup_ratio·total_steps then linear decay to 0, clip_grad_norm 5
(src/multitask.py:279-300).

TPU note: the optimizer runs only over the *trainable* subtree (see
freezing.split_params), so AdamW moments for the frozen 96–97% of the model
are never materialized — the north-star memory property.
"""

from __future__ import annotations

import re
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def decay_mask(trainable_params) -> Any:
    """True = apply weight decay. No decay for biases and LayerNorm weights
    (reference: trainer_base.py:633-645 no_decay = ['bias', 'LayerNorm.weight'];
    flax LayerNorm weight is 'scale')."""

    def decide(path, leaf):
        name = ".".join(str(getattr(k, "key", k)) for k in path)
        leafname = name.rsplit(".", 1)[-1]
        if "bias" in leafname:
            return False
        if leafname == "scale" and re.search(r"layer_norm|layernorm", name):
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, trainable_params)


def linear_warmup_schedule(lr: float, total_steps: int, warmup_ratio: float = 0.1):
    warmup_steps = max(1, int(total_steps * warmup_ratio))
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps),
         optax.linear_schedule(lr, 0.0, max(1, total_steps - warmup_steps))],
        [warmup_steps])


class HFAdamWState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def hf_adamw(schedule, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-6,
             weight_decay: float = 0.01, mask=None
             ) -> optax.GradientTransformation:
    """transformers.optimization.AdamW semantics, exactly (the optimizer the
    reference instantiates at trainer_base.py:634-704; removed from
    transformers ≥4.56 — re-implemented from its published update rule).

    Differences from optax.adamw that matter for trajectory parity:
    * eps is added to sqrt(nu) BEFORE bias correction — the bias correction
      rides in step_size = lr·sqrt(1−b2^t)/(1−b1^t), so the effective eps
      is larger by 1/sqrt(1−b2^t) early in training;
    * decoupled weight decay is applied AFTER the Adam update, to the
      already-updated parameter, scaled by the scheduled lr.
    """
    mask_tree = mask

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return HFAdamWState(count=jnp.zeros((), jnp.int32), mu=z,
                            nu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr = schedule(state.count)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, grads)
        step_size = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)

        def one(m, v, p, decayed):
            adam = -step_size * m / (jnp.sqrt(v) + eps)
            if weight_decay > 0.0 and decayed:
                # decay the post-adam-update parameter (reference order)
                return adam - lr * weight_decay * (p + adam)
            return adam

        if mask_tree is not None:
            updates = jax.tree_util.tree_map(one, mu, nu, params, mask_tree)
        else:
            updates = jax.tree_util.tree_map(
                lambda m, v, p: one(m, v, p, True), mu, nu, params)
        return updates, HFAdamWState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def build_optimizer(trainable_params, *, lr: float, total_steps: int,
                    warmup_ratio: float = 0.1, weight_decay: float = 0.01,
                    adam_beta1: float = 0.9, adam_beta2: float = 0.999,
                    adam_eps: float = 1e-6, clip_grad_norm: float = 5.0,
                    schedule=None) -> optax.GradientTransformation:
    sched = schedule or linear_warmup_schedule(lr, total_steps, warmup_ratio)
    tx = hf_adamw(sched, b1=adam_beta1, b2=adam_beta2, eps=adam_eps,
                  weight_decay=weight_decay,
                  mask=decay_mask(trainable_params))
    if clip_grad_norm and clip_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad_norm), tx)
    return tx


def build_separate_visual_optimizer(trainable_params, *, lr: float,
                                    total_steps: int, vis_lr: float = 1e-4,
                                    vis_weight_decay: float = 0.01,
                                    use_adam_for_visual: bool = True,
                                    warmup_ratio: float = 0.1,
                                    weight_decay: float = 0.01,
                                    clip_grad_norm: float = 5.0,
                                    **adamw_kw) -> optax.GradientTransformation:
    """--use_separate_optimizer_for_visual: the reference's FusedOptimizer
    (reference: src/utils.py:143, trainer_base.py:646-720) — AdamW on the
    language side, Adam or SGD with its own lr on the visual-encoder params.
    Implemented with optax.multi_transform over a path-label pytree."""

    def label(path, leaf):
        name = ".".join(str(getattr(k, "key", k)) for k in path)
        return "visual" if "vis_encoder" in name or "visual" in name else "lm"

    labels = jax.tree_util.tree_map_with_path(label, trainable_params)
    sched = linear_warmup_schedule(lr, total_steps, warmup_ratio)
    lm_tx = optax.adamw(sched, weight_decay=weight_decay,
                        mask=decay_mask(trainable_params), **adamw_kw)
    if use_adam_for_visual:
        vis_tx = optax.adamw(vis_lr, weight_decay=vis_weight_decay)
    else:
        vis_tx = optax.sgd(vis_lr)
    tx = optax.multi_transform({"lm": lm_tx, "visual": vis_tx}, labels)
    if clip_grad_norm and clip_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad_norm), tx)
    return tx
