"""Jittable train/eval steps over a device mesh.

Reference control flow: src/multitask.py:229-300 (forward → loss →
backward → clip 5 → AdamW → linear schedule). TPU design:

* one compiled step per task (static task id — the reference's per-task
  Python dispatch becomes a jit cache entry per task);
* gradients are taken ONLY w.r.t. the trainable subtree; frozen params enter
  as a separate argument, so XLA constant-folds/never differentiates them and
  optimizer state is param%-sized;
* under a ('data','model') mesh, batch args shard over 'data' — XLA inserts
  the gradient psum over ICI (NCCL all-reduce equivalent);
* the train state is donated, keeping HBM flat.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vlpet_tpu.models.heads import task_loss
from vlpet_tpu.pet.modules import PetContext
from vlpet_tpu.train.freezing import merge_params


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any          # trainable subtree (None placeholders elsewhere)
    opt_state: Any

    @classmethod
    def create(cls, trainable_params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=trainable_params,
                   opt_state=tx.init(trainable_params))


def make_train_step(model, tx, tasks: Tuple[str, ...], lambda_z: float = 0.0):
    """Returns train_step(state, frozen, batch, rng, task_idx) → (state, metrics).

    ``task_idx`` is static; batch is a dict with input_ids, attention_mask,
    vis_feats, boxes, target_ids, optional scores/img_order_ids/obj_order_ids.
    """

    @partial(jax.jit, static_argnums=(4,), donate_argnums=(0,))
    def train_step(state: TrainState, frozen, batch: Dict[str, Any], rng,
                   task_idx: int):
        task = tasks[task_idx]
        ctx = PetContext(task=task, task_idx=task_idx)

        def loss_fn(trainable):
            params = merge_params(trainable, frozen)
            if batch.get("target") is not None:
                # classifier head: BCE over dense answer-score targets,
                # single-start-token decode (reference: vqa_model.py:34-56)
                from vlpet_tpu.models.heads import classifier_bce_loss

                logits = model.apply(
                    {"params": params}, batch["input_ids"],
                    batch["attention_mask"], vis_feats=batch.get("vis_feats"),
                    boxes=batch.get("boxes"),
                    img_order_ids=batch.get("img_order_ids"),
                    obj_order_ids=batch.get("obj_order_ids"), ctx=ctx,
                    deterministic=False, rngs={"dropout": rng},
                    method=type(model).classify)
                return classifier_bce_loss(logits, batch["target"])
            kwargs = dict(
                vis_feats=batch.get("vis_feats"), boxes=batch.get("boxes"),
                img_order_ids=batch.get("img_order_ids"),
                obj_order_ids=batch.get("obj_order_ids"),
                vis_attention_mask=batch.get("vis_attention_mask"),
                labels=batch["target_ids"], ctx=ctx, deterministic=False,
                rngs={"dropout": rng})
            if lambda_z > 0:
                out, inter = model.apply(
                    {"params": params}, batch["input_ids"],
                    batch["attention_mask"], mutable=["intermediates"],
                    **kwargs)
            else:
                out = model.apply({"params": params}, batch["input_ids"],
                                  batch["attention_mask"], **kwargs)
            loss = task_loss(task, out["loss"], batch["target_ids"],
                             batch.get("scores"))
            if lambda_z > 0:
                # adapter-activation L2 regularizer (reference:
                # multitask.py:242-256 — mean over adapters of mean(z^2))
                zs = [z for path, z in jax.tree_util.tree_flatten_with_path(
                          inter)[0]
                      if any(str(getattr(k, "key", k)) == "z" for k in path)]
                if zs:
                    reg = sum(jnp.mean(jnp.square(z.astype(jnp.float32)))
                              for z in zs) / len(zs)
                    loss = loss + lambda_z * reg
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt_state), metrics

    return train_step


def make_eval_loss_step(model, tasks: Tuple[str, ...]):
    @partial(jax.jit, static_argnums=(3,))
    def eval_step(params, frozen, batch, task_idx: int):
        task = tasks[task_idx]
        ctx = PetContext(task=task, task_idx=task_idx)
        merged = merge_params(params, frozen)
        out = model.apply(
            {"params": merged},
            batch["input_ids"], batch["attention_mask"],
            vis_feats=batch.get("vis_feats"), boxes=batch.get("boxes"),
            img_order_ids=batch.get("img_order_ids"),
            obj_order_ids=batch.get("obj_order_ids"),
            vis_attention_mask=batch.get("vis_attention_mask"),
            labels=batch["target_ids"], ctx=ctx, deterministic=True)
        return task_loss(task, out["loss"], batch["target_ids"],
                         batch.get("scores")), out["logits"]

    return eval_step


def make_nlvr_score_step(model, tasks: Tuple[str, ...], true_token_id: int,
                         false_token_id: int, position: int):
    """NLVR never generates: one forward with fixed decoder input, compare
    true/false logits (reference: nlvr_model.py:240-258)."""
    from vlpet_tpu.models.heads import nlvr_predict

    @partial(jax.jit, static_argnums=(3,))
    def score_step(params, frozen, batch, task_idx: int):
        task = tasks[task_idx]
        ctx = PetContext(task=task, task_idx=task_idx)
        merged = merge_params(params, frozen)
        out = model.apply(
            {"params": merged},
            batch["input_ids"], batch["attention_mask"],
            vis_feats=batch.get("vis_feats"), boxes=batch.get("boxes"),
            img_order_ids=batch.get("img_order_ids"),
            obj_order_ids=batch.get("obj_order_ids"),
            decoder_input_ids=batch["decoder_input_ids"],
            ctx=ctx, deterministic=True)
        return nlvr_predict(out["logits"], true_token_id, false_token_id, position)

    return score_step


def make_raw_train_step(model, tx, tasks: Tuple[str, ...]):
    """Train step for the raw-image path (RawInputVLModel): images go through
    the CLIP trunk inside the same XLA program, so --unfreeze_vis_encoder /
    --use_vis_adapter gradients flow end-to-end (the reference's raw_*
    feature_type, multitask.py:648-660 + vis_forward)."""

    @partial(jax.jit, static_argnums=(5,), donate_argnums=(0,))
    def train_step(state: TrainState, frozen, batch_stats, batch: Dict[str, Any],
                   rng, task_idx: int):
        task = tasks[task_idx]
        ctx = PetContext(task=task, task_idx=task_idx)

        def loss_fn(trainable):
            params = merge_params(trainable, frozen)
            variables = {"params": params}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats  # frozen BN statistics
            out = model.apply(variables, batch["input_ids"],
                              batch["attention_mask"], batch["images"],
                              labels=batch["target_ids"], ctx=ctx,
                              deterministic=False, rngs={"dropout": rng})
            return task_loss(task, out["loss"], batch["target_ids"],
                             batch.get("scores"))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (TrainState(step=state.step + 1, params=new_params,
                           opt_state=new_opt_state),
                {"loss": loss, "grad_norm": optax.global_norm(grads)})

    return train_step
