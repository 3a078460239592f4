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
from typing import Any, Optional

import jax
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


def build_optimizer(trainable_params, *, lr: float, total_steps: int,
                    warmup_ratio: float = 0.1, weight_decay: float = 0.01,
                    adam_beta1: float = 0.9, adam_beta2: float = 0.999,
                    adam_eps: float = 1e-6, clip_grad_norm: float = 5.0,
                    schedule=None) -> optax.GradientTransformation:
    sched = schedule or linear_warmup_schedule(lr, total_steps, warmup_ratio)
    tx = optax.adamw(sched, b1=adam_beta1, b2=adam_beta2, eps=adam_eps,
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
