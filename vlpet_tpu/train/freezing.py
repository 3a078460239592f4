"""Freezing engine + post-init weight overrides.

Reproduces the reference's name/type-driven selective unfreeze
(reference: src/trainer_base.py:268-542) and the post-hoc identity
re-initialization (reference: src/trainer_base.py:544-599) on flax param
pytrees. Paths are '.'-joined flax key paths; the substring rules below map
1:1 onto the reference's ``named_parameters`` substring matches (module
naming in vlpet_tpu.models mirrors the reference's attribute names, so the
same substrings select the same tensors).

The trainable mask drives both gradient computation (the train step takes
grads only w.r.t. the trainable subtree) and the optimizer (frozen params
never get optimizer state) — the reason the optimizer memory footprint is
~param%-sized instead of full-model-sized.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vlpet_tpu.config import PetConfig

# module names that are AdapterController instances (reference isinstance
# check at trainer_base.py:393-397)
_CONTROLLER_NAMES = (
    "attn_adapter", "ff_adapter", "self_attn_adapter", "enc_attn_adapter",
    "decoder_self_attn_adapter", "decoder_enc_attn_adapter", "decoder_ff_adapter",
    "decoder_enc_attn_key_value_adapter", "attn_value_parallel_adapter",
    "attn_key_parallel_adapter", "enc_attn_value_sequential_adapter",
)
_CONTROLLER_RE = re.compile(r"(^|\.)(" + "|".join(_CONTROLLER_NAMES) + r")\.")

# buffers — never trainable (reference registers these as buffers, not params)
_BUFFER_RE = re.compile(r"final_logits_bias")


def path_str(path) -> str:
    return ".".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def flatten_with_paths(params) -> List[Tuple[str, Any]]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [(path_str(p), v) for p, v in flat]


def _is_layer_norm(name: str) -> bool:
    return "layer_norm" in name or "layernorm" in name


def path_is_trainable(name: str, pet: PetConfig) -> bool:
    """Substring trainability decision for one param path. Public so the
    oracle-parity tests can apply the IDENTICAL rules to the reference's
    torch ``named_parameters`` names (module naming mirrors the reference,
    so the same substrings select the same tensors on both sides)."""
    return _decide(name, pet)


def trainable_mask(params, pet: PetConfig) -> Any:
    """Boolean pytree: True = trainable. Rule order follows
    trainer_base.py:308-542 (all rules are additive unfreezes over a
    freeze-everything base)."""

    def decide(name: str) -> bool:
        return _decide(name, pet)

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves = [decide(path_str(p)) for p, _ in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def _decide(name: str, pet: PetConfig) -> bool:
    if _BUFFER_RE.search(name):
        return False
    t = False
    if not pet.freeze_vis_emb and "visual_embedding" in name:
        t = True
    if pet.unfreeze_language_model:
        # lm_head/shared + every encoder/decoder param
        if ("lm_head" in name or "shared" in name
                or ".encoder." in name or ".decoder." in name):
            t = True
    if pet.unfreeze_lm_head and ("lm_head" in name or name.endswith("shared")
                                 or ".shared" in name):
        t = True
    if pet.use_lora and ("lora" in name or "bias" in name):
        t = True
    if (pet.encoder_prompt_len > 0 or pet.decoder_prompt_len > 0) \
            and ("prompt_modules" in name or "prefix_embedding" in name):
        t = True
    if pet.use_vis_adapter and "vis_encoder" in name and re.search(
            r"(front|middle|back|transition)_adapter", name):
        t = True
    if pet.unfreeze_vis_encoder and "vis_encoder" in name:
        t = True
    if pet.unfreeze_vis_last_layer and "vis_encoder" in name and "layer4" in name:
        t = True
    if pet.unfreeze_layer_norms and _is_layer_norm(name):
        t = True
    if pet.unfreeze_batch_norms and "batch_norm" in name:
        t = True
    if (pet.use_adapter or pet.use_compacter or pet.use_lradapter) \
            and _CONTROLLER_RE.search(name):
        t = True
    if pet.use_lm_head_adapter and "output_adapter" in name:
        t = True
    if pet.use_hyperformer and ("shared_task_embed" in name
                                or "adapter_layers_hyper_net" in name):
        t = True
    if pet.use_compacter and "phm_rule" in name and pet.learn_phm:
        t = True
    if pet.use_compacter and "phm_W_" in name:
        t = True  # model-shared Compacter slow weights (shared_W_phm)
    if pet.unfreeze_encoder_layer_norms and "encoder." in name and _is_layer_norm(name):
        t = True
    if pet.unfreeze_decoder_layer_norms and "decoder." in name and _is_layer_norm(name):
        t = True
    if pet.unfreeze_decoder_input_layer_norms and "decoder." in name \
            and "layernorm_embedding" in name:
        t = True
    if pet.unfreeze_decoder_self_attn_layer_norms and "decoder." in name \
            and "self_attn_layer_norm" in name:
        t = True
    if pet.unfreeze_decoder_encoder_attn_layer_norms and "decoder." in name \
            and "encoder_attn_layer_norm" in name:
        t = True
    if pet.unfreeze_decoder_ff_layer_norms and "decoder." in name \
            and "final_layer_norm" in name:
        t = True
    if pet.unfreeze_bias and "bias" in name:
        t = True
    if pet.unfreeze_encoder_bias and "encoder." in name and "bias" in name:
        t = True
    if pet.unfreeze_decoder_bias and "decoder." in name and "bias" in name:
        t = True
    if (pet.use_encoder_adapter_gating_large_x
            or pet.use_encoder_adapter_gating_large_x_lowrank
            or pet.use_encoder_gating_large_x_lowrank
            or pet.use_decoder_enc_attn_adapter_gating_large_x_lowrank
            or pet.use_encoder_adapter_gating_small_xy_cat
            or pet.use_encoder_adapter_gating_middle_xy_add
            or pet.use_encoder_adapter_gating_middle_ia3_add) and "gating" in name:
        t = True
    if (pet.use_decoder_enc_attn_value_parallel_adapter_down_dim
            or pet.use_decoder_enc_attn_key_parallel_adapter_down_dim
            or pet.use_decoder_enc_attn_key_value_adapter_down_dim
            or pet.use_decoder_enc_attn_adapter_down_dim
            or pet.use_decoder_enc_attn_value_sequential_adapter_down_dim
            or pet.use_encoder_attn_value_parallel_adapter_down_dim
            or pet.use_encoder_adapter_down_multihead
            or pet.use_encoder_adapter_up_multihead
            or pet.use_encoder_adapter_down_up_multihead
            or pet.use_encoder_adapter_down_up_pair_multihead
            or pet.use_decoder_enc_attn_value_parallel_adapter_down_multihead
            or pet.use_decoder_enc_attn_value_parallel_adapter_down_up_pair_multihead
            or pet.use_decoder_self_attn_value_parallel_adapter_down_dim
            or pet.use_decoder_self_attn_adapter_down_dim
            or pet.use_decoder_ff_adapter_down_dim
            or pet.use_decoder_adapter_down_multihead) and "adapter" in name:
        t = True
    if (pet.use_decoder_enc_attn_value_ia3 or pet.use_encoder_attn_value_ia3
            or pet.use_decoder_self_attn_value_ia3
            or pet.use_decoder_ff_ia3) and "ia3" in name:
        t = True
    return t


def weight_initialization(params, pet: PetConfig):
    """Post-hoc identity re-init (reference: trainer_base.py:544-599).
    Returns a new param pytree."""

    rules: List[Tuple[re.Pattern, float]] = []
    if (pet.use_decoder_enc_attn_value_ia3_one_init
            or pet.use_encoder_attn_value_ia3_one_init
            or pet.use_decoder_self_attn_value_ia3_one_init
            or pet.use_decoder_ff_ia3_one_init):
        rules.append((re.compile(r"ia3"), 1.0))
    if pet.use_encoder_multihead_up_zero_init:
        rules.append((re.compile(r"adapter_multihead.*(\.up\.|up_kernel|up_bias)"), 0.0))
    if pet.use_encoder_gating_large_x_lowrank_up_zero_init:
        rules.append((re.compile(r"adapter_gating_large_x.*\.up\."), 0.0))
    if pet.use_decoder_enc_vpa_up_zero_init:
        # cross-attention VPA only (reference: trainer_base.py:567-575 keys
        # on EncDecAttention/encoder_attn); this tree names the T5 cross
        # attention 'cross_attn' — decoder SELF-attn VPA must not match
        rules.append((re.compile(
            r"(encoder_attn|EncDecAttention|cross_attn)"
            r"\.attn_value_parallel_adapter.*up_sampler"), 0.0))
    if pet.use_encoder_gating_small_up_zero_init:
        rules.append((re.compile(r"adapter_gating_small_xy_cat"), 0.0))
    if pet.use_encoder_gating_middle_up_zero_init:
        rules.append((re.compile(r"adapter_gating_middle_xy_add"), 0.0))
    if pet.use_encoder_gating_middle_ia3_one_init:
        rules.append((re.compile(r"gating_middle_ia3"), 1.0))
    if pet.use_encoder_gating_middle_ia3_zero_init:
        rules.append((re.compile(r"gating_middle_ia3"), 0.0))

    if not rules:
        return params

    def override(path, leaf):
        name = path_str(path)
        for pat, val in rules:
            if pat.search(name):
                return jnp.full_like(leaf, val)
        return leaf

    return jax.tree_util.tree_map_with_path(override, params)


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def trainable_report(params, mask, exclude_buffers: bool = True
                     ) -> Dict[str, Any]:
    """The reference's trainable-parameter accounting
    (trainer_base.py:237-266): percentage = trainable / total · 100, where
    buffers (final_logits_bias) are excluded from both (torch buffers are not
    in named_parameters)."""
    flat_p = flatten_with_paths(params)
    flat_m = [m for _, m in flatten_with_paths(mask)]
    total = 0
    trainable = 0
    per_param = []
    for (name, p), m in zip(flat_p, flat_m):
        n = int(np.prod(p.shape))
        if exclude_buffers and _BUFFER_RE.search(name):
            continue
        total += n
        if m:
            trainable += n
        per_param.append((name, n, bool(m)))
    pct = 100.0 * trainable / max(total, 1)
    return {"total": total, "trainable": trainable, "percentage": pct,
            "per_param": per_param}


def split_params(params, mask):
    """Partition into (trainable, frozen) trees with None placeholders —
    the train step takes grads only w.r.t. the trainable tree, so optax never
    materializes moments for frozen weights."""
    trainable = jax.tree_util.tree_map(lambda p, m: p if m else None, params, mask,
                                       is_leaf=lambda x: x is None)
    frozen = jax.tree_util.tree_map(lambda p, m: None if m else p, params, mask,
                                    is_leaf=lambda x: x is None)
    return trainable, frozen


def merge_params(trainable, frozen):
    return jax.tree_util.tree_map(
        lambda t, f: t if t is not None else f, trainable, frozen,
        is_leaf=lambda x: x is None)
